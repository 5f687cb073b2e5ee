package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{Cleanse, Enrich, Flatten, Upsert}
import graft.ext.{Dedup, Similarity, TextOps}
import graft.registry.Fixtures._

/** named batch analytics: windows, as-of/interval joins, CDC,
  * SCD2, graph, stats/profiling, behavior and TPC-H showcase queries.
  * Pure relocation of the former SparkEntry map entries — no query or
  * oracle text changed in the split.
  */
private[graft] object AnalyticsQueries {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- pure-SQL surface: the same engine through spark.sql over
    // temp views (north star: "DataFrame ops + Spark SQL"). The SQL
    // text is dialect-shared — the DuckDB oracle runs the IDENTICAL
    // statement, so these rows prove the SQL path end-to-end ----
    "q_sql_star_agg" -> ((s, d) => {
      // the Q30 flagship star join expressed as one SQL statement;
      // Catalyst plans the same broadcast star shape it gives the
      // DataFrame form
      registerViews(s, d)
      s.sql("""
        SELECT n.n_name, date_trunc('month', o.o_orderdate) AS month,
          CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
          count(DISTINCT o.o_orderkey) AS n_orders
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE o.o_orderdate >= TIMESTAMP '1995-01-01' AND o.o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n.n_name, date_trunc('month', o.o_orderdate)
        ORDER BY n_name, month""")
    }),

    "q_sql_exists" -> ((s, d) => {
      // TPC-H Q21 shape on the SQL surface: correlated EXISTS (another
      // supplier in the same order) + correlated NOT EXISTS (none
      // shipped later) — Catalyst decorrelates both into semi/anti
      // joins on l_orderkey; no per-row subquery execution survives in
      // the plan. "Last-to-ship supplier in multi-supplier orders."
      registerViews(s, d)
      s.sql("""
        SELECT s_name, count(*) AS n
        FROM supplier, lineitem l1, orders
        WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
          AND EXISTS (SELECT * FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT * FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > l1.l_shipdate)
        GROUP BY s_name ORDER BY n DESC, s_name LIMIT 20""")
    }),

    "q_sql_recursive" -> ((s, d) => {
      // RECURSIVE CTE through the SQL surface (Spark 4.1's
      // UnionLoop): breadth-first closure of the implicit binary-heap
      // hierarchy parent(c)=⌊c/2⌋ over customer keys — per-depth node
      // counts and key sums. Each iteration is one hash join of the
      // frontier against the base scan; the frontier shrinks
      // geometrically, so total work is O(n·depth) with depth =
      // log₂(maxkey). The identical statement runs on DuckDB — the
      // whole point of the q_sql_* tier. floor(x/2.0) keys the parent
      // edge because `/` is float division in BOTH dialects (DIV vs
      // // would fork the text).
      registerViews(s, d)
      s.sql("""
        WITH RECURSIVE tree AS (
          SELECT c_custkey AS node, 0 AS depth FROM customer WHERE c_custkey = 0
          UNION ALL
          SELECT c.c_custkey AS node, t.depth + 1 AS depth
          FROM customer c JOIN tree t
            ON CAST(floor(CAST(c.c_custkey AS DOUBLE) / 2) AS BIGINT) = t.node
          WHERE c.c_custkey > 0)
        SELECT depth, count(*) AS n, CAST(sum(node) AS BIGINT) AS key_sum
        FROM tree GROUP BY depth ORDER BY depth""")
    }),

    "q_sql_running_total" -> ((s, d) => {
      // SQL window function through the SQL surface: per-customer
      // running revenue, decimal-accumulated, full deterministic
      // tie-break on the order key
      registerViews(s, d)
      s.sql("""
        SELECT o_custkey, o_orderkey,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE)
            AS running_total
        FROM orders ORDER BY o_custkey, o_orderkey""")
    }),

    "q_sql_topk_users" -> ((s, d) => {
      // nested aggregate + ranked-window top-k per event type, pure SQL
      registerViews(s, d)
      s.sql("""
        SELECT event_type, user_id, n, CAST(rk AS INTEGER) AS rk FROM (
          SELECT event_type, user_id, n,
            row_number() OVER (PARTITION BY event_type ORDER BY n DESC, user_id) AS rk
          FROM (SELECT event_type, user_id, count(*) AS n
                FROM events GROUP BY 1, 2))
        WHERE rk <= 5 ORDER BY event_type, rk""")
    }),

    "q_union_pages" -> ((s, d) => {
      // union-of-pages accumulation (Extract.py:52)
      val o = t(s, d, "orders").select("o_orderkey", "o_totalprice")
      val p1 = o.filter(col("o_orderkey") % 2 === 0)
      val p2 = o.filter(col("o_orderkey") % 2 =!= 0)
      p1.unionByName(p2).orderBy("o_orderkey")
    }),

    "q_rollup_cube" -> ((s, d) =>
      // engine capability beyond reference: grouping-sets rollup
      t(s, d, "lineitem").rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),

    "q_window_rank" -> ((s, d) => {
      // window ranking: top-3 orders per customer by price
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, d, "orders")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
        .orderBy("o_custkey", "rk")
    }),

    "q_url_codec" -> ((s, d) =>
      // URL form-encode + decode round-trip (Extract.py:37,46); p_name
      // is [a-z ] so the oracle can replicate the encoding exactly
      t(s, d, "part").select(col("p_partkey"),
          Cleanse.urlEncode(col("p_name")).as("enc"),
          Cleanse.urlDecode(Cleanse.urlEncode(col("p_name"))).as("roundtrip"))
        .orderBy("p_partkey")),

    "q_paged_extract" -> ((s, d) => {
      // connector round-trip (Extract.py:23-117 shape): dump documents
      // as paged JSON-array files (the extract's dump format), re-read
      // through the paginating connector with its stop-on-empty
      // protocol. Page assembly is bounded driver work, like the
      // reference's own HTTP loop.
      val docs = t(s, d, "documents").select("doc_id", "lang", "n_chars").orderBy("doc_id")
      val rows = docs.toJSON.collect()
      val dir = java.nio.file.Files.createTempDirectory("graft-paged").toString
      // data pages 0..n-1, then the terminating empty page at exactly n
      val pages = rows.grouped(200).toSeq :+ Array.empty[String]
      pages.zipWithIndex.foreach { case (page, i) =>
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(dir, s"documents-$i.json"),
          page.mkString("[", ",", "]"))
      }
      graft.sources.PagedExtract.read(s,
          new graft.sources.PagedExtract.LocalDirFetcher(dir, "documents"))
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy("doc_id")
    }),

    "q_paged_scan_v2" -> ((s, d) => {
      // the extract-dump round-trip ENTIRELY through the DataSource V2
      // connector (graft.sources.PagedSourceProvider): the dump is
      // PUBLISHED by the connector's atomic write path (per-task page
      // temps, commit renames + terminator page), then read back as a
      // parallel page scan with the `page` predicate pushed so the
      // terminator's file is pruned at planning time and never opened.
      val dir = java.nio.file.Files.createTempDirectory("graft-paged-v2").toString
      t(s, d, "documents").select("doc_id", "lang", "n_chars")
        .toJSON.toDF("payload").repartition(3)
        .write.format("graft-paged")
        .option("dir", dir).option("prefix", "documents").mode("append").save()
      val sch = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n_chars", org.apache.spark.sql.types.LongType)))
      s.read.format("graft-paged")
        .option("dir", dir).option("prefix", "documents").load()
        .filter(col("page") < 3)
        .select(from_json(col("payload"), sch).as("r"))
        .select("r.doc_id", "r.lang", "r.n_chars")
        .orderBy("doc_id")
    }),

    "q_paged_manifest" -> ((s, d) => {
      // extract-completeness verdicts (the count check Extract.py:158
      // left as a TODO): publish a dump through the connector, then
      // verifyDump re-derives page structure + row count from the
      // published files and compares against the commit-written
      // manifest — contiguity, terminator, page count, row count
      val tmp = graft.registry.Fixtures.scratchDir("graft-paged-man")
      t(s, d, "documents")
        .select(to_json(struct(col("doc_id"), col("lang"))).as("payload"))
        .repartition(4).write.format("graft-paged")
        .option("dir", s"$tmp/pages").option("prefix", "docs")
        .mode("append").save()
      graft.sources.PagedV2.verifyDump(s, s"$tmp/pages", "docs")
        .orderBy("check_name")
    }),

    "q_events_daily" -> ((s, d) =>
      // event-time daily rollup over the ns-timestamp stream table
      events(s, d)
        .groupBy(date_trunc("day", col("ts_us")).as("day"))
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
        .orderBy("day")),

    "q_corrupt_records" -> ((s, d) => {
      // ingest robustness: a feed where every 7th payload is truncated
      // mid-JSON parses in PERMISSIVE mode — corrupt rows land intact
      // in the capture column instead of failing the batch, and the
      // summary splits clean/corrupt per lang
      val feed = t(s, d, "documents").select(col("doc_id"), col("lang"),
        when(col("doc_id") % 7 === 0,
          concat(lit("""{"n":"""), col("n_chars"), lit(""", "truncat""")))
          .otherwise(concat(lit("""{"n":"""), col("n_chars"), lit("}")))
          .as("payload"))
      val sch = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("n", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("_bad", org.apache.spark.sql.types.StringType)))
      feed.select(col("doc_id"), col("lang"),
          from_json(col("payload"), sch,
            Map("mode" -> "PERMISSIVE",
              "columnNameOfCorruptRecord" -> "_bad")).as("r"))
        .select(col("doc_id"), col("lang"), col("r.n").as("n"),
          col("r._bad").isNotNull.as("corrupt"))
        .groupBy("lang", "corrupt")
        .agg(count(lit(1)).as("n_rows"), sum(col("n")).as("n_sum"))
        .orderBy("lang", "corrupt")
    }),

    "q_cdc_apply" -> ((s, d) => {
      // CDC round-trip law as a driver-checked row: corrupt a snapshot
      // (drop every 7th order, overprice every 5th, inject aliens),
      // diffFull against the truth, applyChanges — the result must BE
      // the truth, which is exactly what the oracle selects
      val truth = t(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      val corrupted = truth
        .filter(col("o_orderkey") % 7 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice")))
        .unionByName(s.range(3).select((col("id") + 900000000L).as("o_orderkey"),
          lit(1L).as("o_custkey"), lit("X").as("o_orderstatus"),
          lit(0.0).as("o_totalprice")))
      val feed = graft.ops.Snapshot.diffFull(corrupted, truth, Seq("o_orderkey"))
      graft.ops.Snapshot.applyChanges(corrupted, feed, Seq("o_orderkey"))
        .orderBy("o_orderkey")
    }),

    "q_auc" -> ((s, d) =>
      // ROC AUC of value as a purchase predictor — Mann-Whitney over
      // 6-dp-rounded DISTINCT-score groups (the bounded-domain
      // contract the engine now ENFORCES: auc requires probability-
      // shaped scores in [0,1]). value is a dollar amount, so it is
      // squashed v/(v+100) first — strictly monotone for v > 0, so
      // the ranking (and AUC, up to 6-dp tie merges) is unchanged,
      // and IEEE division replays bit-identically in the oracle.
      // ASSUMES value >= 0 (dollar amounts): a negative value (e.g.
      // refund rows in a future dataset) squashes out of [0,1] and
      // the engine's in-scan domain guard raises loudly at execution
      // — the understandable failure; do NOT clamp here (greatest(v,0)
      // would silently collapse all negatives into one tied score)
      graft.ext.Eval.auc(
        events(s, d).select((col("event_type") === "purchase").as("y"),
          (col("value") / (col("value") + lit(100.0))).as("score")),
        "y", "score")),

    "q_auc_binned" -> ((s, d) =>
      // the sketch companion to q_auc for probability scores: 256
      // equal-width bins, exact Mann-Whitney over the BINS — O(nBins)
      // mergeable state, streaming-friendly; EvalSpec pins the
      // |binned - exact| error bound
      graft.ext.Eval.aucBinned(
        t(s, d, "lineitem").select(
          (col("l_returnflag") === "R").as("y"),
          (pmod(col("l_partkey"), lit(997)).cast("double") / lit(997.0))
            .as("score")),
        "y", "score", nBins = 256)),

    "q_avg_precision" -> ((s, d) =>
      // average precision (step-interpolated PR-AUC, the sklearn
      // definition): one operating point per 6-dp-rounded distinct
      // score, cumulative window over GROUP rows, decimal term sums.
      // Same value >= 0 assumption as q_auc — negatives raise via the
      // domain guard rather than silently reordering
      graft.ext.Eval.averagePrecision(
        events(s, d).select((col("event_type") === "purchase").as("y"),
          (col("value") / (col("value") + lit(100.0))).as("score")),
        "y", "score")),

    "q_kappa" -> ((s, d) =>
      // Cohen's kappa between event_type and a deterministic noisy
      // second "rater" (agrees 70% of the time, else says view) — the
      // annotation-agreement readout; integral to ONE final division
      graft.ext.Eval.cohenKappa(
        events(s, d).select(col("event_type").as("rater_a"),
          when(pmod(col("event_id"), lit(10)) < 7, col("event_type"))
            .otherwise(lit("view")).as("rater_b")),
        "rater_a", "rater_b")),

    "q_chi2" -> ((s, d) =>
      // chi-square independence of event mix vs user cohort — the
      // categorical drift test; full margin cross product (zero cells
      // contribute expected mass), 9-dp decimal term sums
      graft.ext.Eval.chi2Independence(
        events(s, d).select(col("event_type"),
          pmod(col("user_id"), lit(4)).cast("string").as("cohort")),
        "event_type", "cohort")),

    "x_mutual_info" -> ((s, d) =>
      // mutual information + entropies + sqrt-NMI of the SAME event
      // mix vs cohort contingency q_chi2 grades — the effect-size
      // companion (chi2 grows with n; MI does not). 9-dp ln rounding,
      // 12-dp decimal term sums, 6-dp metrics
      graft.ext.Eval.mutualInformation(
        events(s, d).select(col("event_type"),
          pmod(col("user_id"), lit(4)).cast("string").as("cohort")),
        "event_type", "cohort")),

    "x_ks_test" -> ((s, d) =>
      // two-sample KS drift: order-price distribution of urgent vs low
      // priority orders over 1024 equal-width bins — integer-exact
      // cross-multiplied CDF gaps, one final division (no
      // transcendental anywhere; sqrt is IEEE-exact)
      graft.ext.Eval.ksTestBinned(t(s, d, "orders"),
        "o_totalprice", "o_orderpriority", "1-URGENT", "5-LOW",
        lo = 0.0, hi = 500000.0, nBins = 1024)),

    "x_cluster_eval" -> ((s, d) =>
      // pairwise precision/recall/F1 + Adjusted Rand Index of market
      // segment as a predicted clustering against nation ground truth
      // — all four metrics from pair-count sufficient statistics
      // (Σ c·(c−1) over contingency cells/margins), NO pair
      // enumeration; the METRIC's arithmetic is what's gated
      graft.ext.Eval.clusteringEval(t(s, d, "customer"),
        "c_custkey", "c_mktsegment", "c_nationkey")),

    "x_conformal" -> ((s, d) =>
      // split-conformal calibration: ramp nonconformity scores,
      // calibration half by orderkey parity, qhat = the
      // ceil((n+1)(1-alpha))-th smallest calibration score resolved
      // over DISTINCT 6-dp values (never row ranks), eval-side
      // empirical coverage per alpha — expect coverage >= 1-alpha
      graft.ext.Eval.conformal(
        t(s, d, "lineitem").select(
          (pmod(col("l_partkey"), lit(997)).cast("double") / lit(997.0))
            .as("score"),
          (pmod(col("l_orderkey"), lit(2)) === 0).as("cal")),
        "score", "cal", Seq(0.05, 0.1, 0.25))),

    "x_label_noise" -> ((s, d) => {
      // confident-learning label-noise estimate over returnflag:
      // probability ramps boost the TRUE class (+4), then ~10% of rows'
      // GIVEN label rotates A->N->R->A — injected noise the
      // confident joint must surface as off-diagonal mass (expected
      // noise_frac ~ 0.1); thresholds compare via exact-decimal
      // cross-multiplication — the METRIC's arithmetic is what's gated
      val a = pmod(col("l_partkey"), lit(5)) + lit(1)
      val nW = pmod(col("l_suppkey"), lit(5)) + lit(1)
      val r = pmod(col("l_orderkey"), lit(5)) + lit(1)
      val tot = (a + nW + r + lit(4)).cast("double")
      def p(w: org.apache.spark.sql.Column, cls: String) =
        (w + when(col("l_returnflag") === cls, lit(4)).otherwise(lit(0)))
          .cast("double") / tot
      val rotated = when(col("l_returnflag") === "A", lit("N"))
        .when(col("l_returnflag") === "N", lit("R")).otherwise(lit("A"))
      val given = when(
        pmod(col("l_partkey") + col("l_linenumber"), lit(10)) === 0, rotated)
        .otherwise(col("l_returnflag"))
      graft.ext.Eval.labelNoise(
        t(s, d, "lineitem").select(given.as("y"),
          p(a, "A").as("pa"), p(nW, "N").as("pn"), p(r, "R").as("pr")),
        "y", Seq("A" -> col("pa"), "N" -> col("pn"), "R" -> col("pr")))
    }),

    "q_ece" -> ((s, d) =>
      // expected/max calibration error of a synthesized [0,1) scorer
      // against the return flag — per-bin decimal score mass, 9-dp
      // gaps, one final division. The score is a deterministic
      // integer-mod ramp (replayed exactly by the oracle): the
      // METRIC's arithmetic is what's gated, not a model
      graft.ext.Eval.ece(
        t(s, d, "lineitem").select(
          (col("l_returnflag") === "R").as("y"),
          (pmod(col("l_partkey"), lit(997)).cast("double") / lit(997.0))
            .as("score")),
        "y", "score", nBins = 10)),

    "q_reliability" -> ((s, d) =>
      // the calibration DIAGRAM behind q_ece: per-bin count, clamped
      // mean confidence, positive rate, 9-dp gap — same clamp/bin
      // discipline so the two readouts agree bin-for-bin
      graft.ext.Eval.reliabilityBins(
        t(s, d, "lineitem").select(
          (col("l_returnflag") === "R").as("y"),
          (pmod(col("l_partkey"), lit(997)).cast("double") / lit(997.0))
            .as("score")),
        "y", "score", nBins = 10)
        .orderBy("bin")),

    "q_spearman" -> ((s, d) =>
      // Spearman rank correlation of quantity vs extended price —
      // tie-aware average ranks from DISTINCT-value cumulative windows
      // (no row-level rank), doubled-rank integer moments, one double
      // conversion at the end
      graft.ext.Eval.spearmanCorr(
        t(s, d, "lineitem").select(col("l_quantity"), col("l_extendedprice")),
        "l_quantity", "l_extendedprice")),

    "q_confusion" -> ((s, d) =>
      // threshold sweep readout (the operating-point picker): all
      // tp/fp/fn/tn counts in ONE conditional-sum aggregate pass,
      // unpacked to a row per threshold; same ramp scorer as q_ece
      graft.ext.Eval.confusionAtThresholds(
        t(s, d, "lineitem").select(
          (col("l_returnflag") === "R").as("y"),
          (pmod(col("l_partkey"), lit(997)).cast("double") / lit(997.0))
            .as("score")),
        "y", "score", Seq(0.25, 0.5, 0.75))
        .orderBy("threshold")),

    "q_brier" -> ((s, d) =>
      // Brier score of the same ramp scorer — distinct-(p,y) groups,
      // 9-dp squared-error terms, exact integer×decimal weighted mean
      graft.ext.Eval.brier(
        t(s, d, "lineitem").select(
          (col("l_returnflag") === "R").as("y"),
          (pmod(col("l_partkey"), lit(997)).cast("double") / lit(997.0))
            .as("score")),
        "y", "score")),

    "q_logloss" -> ((s, d) =>
      // mean binary cross-entropy with the distinct-(p,y) reduction:
      // ln evaluates O(distinct scores) times (997 ramp values), each
      // term scales by its exact count in decimal, one final division
      graft.ext.Eval.logLoss(
        t(s, d, "lineitem").select(
          (col("l_returnflag") === "R").as("y"),
          (pmod(col("l_partkey"), lit(997)).cast("double") / lit(997.0))
            .as("score")),
        "y", "score")),

    "q_standardize" -> ((s, d) =>
      // per-type z-scores from exact decimal moments (the feature-
      // scaling step), null for degenerate groups
      graft.ops.Validate.standardize(
        events(s, d).select(col("event_id"), col("event_type"), col("value")),
        "event_type", "value")
        .orderBy("event_id")),

    "q_skew_profile" -> ((s, d) =>
      // join-key skew diagnostics on the fact's supplier key: top-5
      // heaviest keys + max/avg factor + entropy — the numbers that
      // decide between a plain shuffle and saltedJoin
      graft.ops.Validate.skewProfile(t(s, d, "lineitem"), "l_suppkey", topK = 5)),

    "q_psi_drift" -> ((s, d) => {
      // distribution drift (PSI) of late-period order values against
      // the early period, over the early period's own decile bins —
      // the retrain/alert trigger of a production feature pipeline
      val o = t(s, d, "orders")
      val cut = lit("1996-01-01")
      graft.ops.Validate.psiDrift(
        o.filter(col("o_orderdate") < cut),
        o.filter(col("o_orderdate") >= cut),
        "o_totalprice", nBins = 10)
        .orderBy("bin")
    }),

    "q_binned_range_join" -> ((s, d) =>
      // the SCALE form of q_range_join: when the interval side is too
      // big to broadcast, intervals explode into fixed-width bins and
      // the join becomes an equi-join on bin (shuffled hash/SMJ, never
      // a nested loop); the exact predicate re-filters, so results are
      // exactly the theta join's. Here: customers whose balance falls
      // within [s_acctbal, s_acctbal+500) of some supplier.
      graft.ops.Intervals.binnedPointJoin(
        t(s, d, "customer").select(col("c_custkey"), col("c_acctbal")),
        "c_acctbal",
        t(s, d, "supplier").select(col("s_suppkey"), col("s_acctbal").as("lo"),
          (col("s_acctbal") + 500.0).as("hi")),
        "lo", "hi", binSize = 250.0)
        .select("c_custkey", "s_suppkey", "c_acctbal")
        .orderBy("c_custkey", "s_suppkey")),

    "q_hierarchy_levels" -> ((s, d) =>
      // recursive-CTE workload without a recursive CTE: depth of each
      // node in a synthetic referral forest (customer c's parent is
      // c div 10) via bounded synchronous BFS — the org-chart /
      // category-tree unroll, matched against DuckDB's actual
      // WITH RECURSIVE
      graft.ext.Graph.hierarchyLevels(
        t(s, d, "customer").filter(col("c_custkey") >= 10)
          .select(col("c_custkey").as("child"),
            expr("c_custkey div 10").as("parent")),
        "child", "parent", maxDepth = 6)
        .orderBy("node")),

    "q_window_suite" -> ((s, d) => {
      // ranking-function breadth on one partition spec: rank,
      // dense_rank, percent_rank, cume_dist, ntile(4), lag/lead —
      // fully tie-broken ordering so every engine agrees row-for-row
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          round(percent_rank().over(w), 6).as("prnk"),
          round(cume_dist().over(w), 6).as("cd"),
          ntile(4).over(w).as("quartile"),
          lag(col("o_orderkey"), 1).over(w).as("prev_ok"),
          lead(col("o_orderkey"), 1).over(w).as("next_ok"))
        .orderBy("o_custkey", "rnk")
    }),

    "q_expectations" -> ((s, d) => {
      // declarative data contract over orders: row rules fold into ONE
      // aggregate pass, uniqueness adds its groupBy — the per-rule
      // violations frame a CI gate diffs
      import graft.ops.Validate._
      expect(t(s, d, "orders"), Seq(
        ExpectNotNull("custkey_not_null", "o_custkey"),
        ExpectUnique("orderkey_unique", Seq("o_orderkey")),
        ExpectInRange("price_range", "o_totalprice", 0.0, 1e6),
        ExpectInSet("status_domain", "o_orderstatus", Seq("F", "O", "P")),
        ExpectMatches("priority_shape", "o_orderpriority", "^[1-5]-[A-Z]+$"),
        ExpectSatisfies("dates_sane", "o_orderdate >= DATE'1992-01-01' AND o_orderdate < DATE'1999-01-01'")))
    }),

    "q_skew_join" -> ((s, d) =>
      // hot-key-only salted join (the soak-measured winner among skew
      // mitigations): results must equal the plain join exactly —
      // which is precisely what the oracle computes
      graft.ops.Enrich.skewJoin(
          t(s, d, "lineitem").select("l_orderkey", "l_linenumber", "l_suppkey", "l_quantity"),
          t(s, d, "supplier").select("s_suppkey", "s_name"),
          "l_suppkey", "s_suppkey", hotKeys = Seq(1L, 2L, 3L), saltBuckets = 8)
        .select("l_orderkey", "l_linenumber", "l_suppkey", "l_quantity", "s_name")
        .orderBy("l_orderkey", "l_linenumber", "l_suppkey", "l_quantity", "s_name")),

    "q_assoc_rules" -> ((s, d) =>
      // directional rules: top-20 supplier associations by confidence
      // ("orders containing A also contain B"), noise-pruned
      graft.ext.Behavior.associationRules(
          t(s, d, "lineitem"), "l_orderkey", "l_suppkey", minPairCount = 3L)
        .orderBy(col("confidence").desc, col("cab").desc,
          col("antecedent").asc, col("consequent").asc)
        .limit(20)),

    "q_coocurrence" -> ((s, d) =>
      // market-basket association: supplier pairs sharing an order,
      // top-20 by support — the pair space is per-basket-bounded
      // (self-join on the order key, never |items|²)
      graft.ext.Behavior.coOccurrence(
          t(s, d, "lineitem"), "l_orderkey", "l_suppkey")
        .orderBy(col("cab").desc, col("lift").desc, col("ia").asc, col("ib").asc)
        .limit(20)),

    "q_interval_overlap_join" -> ((s, d) => {
      // interval×interval overlap at scale: 14-day activity windows of
      // a customer's FILLED orders overlapping windows of their OPEN
      // orders — both sides explode into week bins, equi-join on
      // (bin, custkey), canonical-bin predicate dedups each pair
      // without a distinct shuffle
      def win(status: String, keyAs: String) =
        t(s, d, "orders").filter(col("o_orderstatus") === status)
          .select(col("o_custkey"),
            col("o_orderkey").as(keyAs),
            datediff(col("o_orderdate"), lit("1970-01-01").cast("date"))
              .cast("double").as(s"${keyAs}_lo"))
          .withColumn(s"${keyAs}_hi", col(s"${keyAs}_lo") + 14.0)
      graft.ops.Intervals.binnedIntervalJoin(
          win("F", "f_order"), "f_order_lo", "f_order_hi",
          win("O", "o_order"), "o_order_lo", "o_order_hi",
          binSize = 7.0, extraKeys = Seq("o_custkey"))
        .select(col("o_custkey"), col("f_order"), col("o_order"))
        .orderBy("o_custkey", "f_order", "o_order")
    }),

    "q_tpch1" -> ((s, d) =>
      // TPC-H Q1 (pricing summary): the canonical wide-aggregate scan
      // — decimal-exact sums, averages as one division over exact
      // sums. disc_price/charge products of 2-dp decimals are exact
      // 4/6-dp decimals before accumulation. The two wide money sums
      // are rounded to 2 dp IN DECIMAL before the double cast — TPC-H's
      // own answer precision: at 10x data their scale-6 exact sums
      // carry 17 significant digits, past double's 15.95, so the
      // decimal→double conversion itself diverges by 1 ulp between
      // engines (both sides held the identical exact decimal). A 2-dp
      // decimal of that magnitude converts exactly. Spark's decimal
      // downscale cast rounds HALF_UP; DuckDB's TRUNCATES (1.556 →
      // 1.55), so the oracle must use round(x, 2) — its half-up —
      // never a decimal cast.
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum((dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
            .cast("decimal(30,4)")).cast("decimal(38,2)").cast("double").as("sum_disc_price"),
          sum((dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount")))
            * (lit(1).cast("decimal(18,2)") + dec(col("l_tax")))).cast("decimal(30,6)"))
            .cast("decimal(38,2)").cast("double").as("sum_charge"),
          round(sum(dec(col("l_quantity"))).cast("double") / count(lit(1)), 6).as("avg_qty"),
          round(sum(dec(col("l_extendedprice"))).cast("double") / count(lit(1)), 6).as("avg_price"),
          round(sum(dec(col("l_discount"))).cast("double") / count(lit(1)), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    "q_tpch3" -> ((s, d) => {
      // TPC-H Q3 (shipping priority): the canonical 3-way join +
      // aggregate + top-k — revenue accumulates in exact decimal
      val c = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, d, "orders").filter(col("o_orderdate") < lit("1995-03-15"))
      val l = t(s, d, "lineitem").filter(col("l_shipdate") > lit("1995-03-15"))
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum((dec(col("l_extendedprice")) *
          (lit(1).cast("decimal(18,2)") - dec(col("l_discount")))).cast("decimal(30,4)"))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderdate").asc, col("l_orderkey").asc)
        .limit(10)
    }),

    "q_tpch6" -> ((s, d) => {
      // TPC-H Q6 (forecasting revenue change): pure scan-side
      // predicate + one exact-decimal aggregate — every filter reaches
      // the parquet scan, zero joins, zero shuffles past the partial agg
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1997-01-01") &&
          dec(col("l_discount")).between(lit(0.05).cast("decimal(18,2)"),
            lit(0.07).cast("decimal(18,2)")) &&
          col("l_quantity") < lit(24))
        .agg(sum((dec(col("l_extendedprice")) * dec(col("l_discount")))
          .cast("decimal(30,4)")).cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
    }),

    "q_tpch10" -> ((s, d) => {
      // TPC-H Q10 (returned item reporting): which customers returned
      // the most revenue in one quarter — returnflag-filtered lineitem
      // ⋈ quarter-filtered orders fact join, customer dim, broadcast
      // nation, top-20 by lost revenue (exact decimal accumulation)
      val o = t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-10-01") &&
          col("o_orderdate") < lit("1997-01-01"))
      t(s, d, "lineitem").filter(col("l_returnflag") === "R")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(sum((dec(col("l_extendedprice")) *
          (lit(1).cast("decimal(18,2)") - dec(col("l_discount")))).cast("decimal(30,4)"))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    }),

    "q_tpch5" -> ((s, d) => {
      // TPC-H Q5 shape (regional supplier revenue): the canonical
      // 6-table star join — region→nation filter broadcast up the dim
      // chain into the lineitem⋈orders fact join. Graded on the
      // SUPPLIER side: the synthetic FK graph never co-locates
      // customer and supplier nations, so the classical
      // c_nationkey = s_nationkey local-supplier predicate selects
      // zero rows on this data; customer still joins in to keep the
      // full 6-table shape.
      val o = t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1997-01-01"))
      t(s, d, "lineitem")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, d, "nation"), col("s_nationkey") === col("n_nationkey"))
        .join(t(s, d, "region").filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum((dec(col("l_extendedprice")) *
          (lit(1).cast("decimal(18,2)") - dec(col("l_discount")))).cast("decimal(30,4)"))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name").asc)
    }),

    "q_tpch19" -> ((s, d) => {
      // TPC-H Q19 shape (discounted revenue, OR-of-ANDs predicate):
      // the disjunctive join filter — Catalyst extracts the common
      // l_partkey = p_partkey equi-key so the OR bands evaluate as a
      // post-join filter on a hash join, never a nested loop
      val rev = (dec(col("l_extendedprice")) *
        (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
        .cast("decimal(30,4)")
      t(s, d, "lineitem")
        .join(t(s, d, "part"), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 20)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
            col("l_quantity").between(10, 35)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(20, 50) &&
            col("l_quantity").between(20, 50)))
        .agg(count(lit(1)).as("n_lines"),
          sum(rev).cast("double").as("revenue"))
    }),

    "q_tpch14" -> ((s, d) => {
      // TPC-H Q14 (promotion effect): one-month fact slice ⋈ part dim,
      // conditional revenue share — both revenue sums exact decimal,
      // cast to double while far under 15.95 digits, ONE division
      val rev = (dec(col("l_extendedprice")) *
        (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
        .cast("decimal(30,4)")
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-03-01") &&
          col("l_shipdate") < lit("1996-04-01"))
        .join(t(s, d, "part"), col("l_partkey") === col("p_partkey"))
        .agg(round(lit(100.0) *
          sum(when(col("p_type") === "PROMO", rev)
            .otherwise(lit(0).cast("decimal(30,4)"))).cast("double") /
          sum(rev).cast("double"), 6).as("promo_revenue_pct"))
    }),

    "q_tpch15" -> ((s, d) => {
      // TPC-H Q15 (top supplier): quarterly per-supplier revenue view,
      // suppliers whose revenue EQUALS the view max. The equality runs
      // in exact DECIMAL (a double compare could split ties the spec
      // says to keep); the max rides back as a 1-row broadcast. The
      // revenue view is tiny (|suppliers| rows) so its two uses are a
      // recompute of one month-sliced scan + hash agg each — at 100 TB
      // persist the view or let AQE reuse the exchange
      val rev = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1996-04-01"))
        .groupBy(col("l_suppkey"))
        .agg(sum((dec(col("l_extendedprice")) *
          (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
          .cast("decimal(30,4)")).as("tr"))
      rev.crossJoin(broadcast(rev.agg(max(col("tr")).as("__mx"))))
        .filter(col("tr") === col("__mx"))
        .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("tr").cast("double").as("total_revenue"))
        .orderBy("s_suppkey")
    }),

    "q_tpch18" -> ((s, d) => {
      // TPC-H Q18 (large-volume customer): HAVING-filtered
      // re-aggregation of the fact feeding a semi-join — the semi
      // filter lands on orders BEFORE the detail join, so only
      // qualifying orders' lineitems flow into the final aggregate
      val l = t(s, d, "lineitem")
      val big = l.groupBy(col("l_orderkey"))
        .agg(sum(dec(col("l_quantity"))).as("sq"))
        .filter(col("sq") > 300).select(col("l_orderkey").as("bk"))
      t(s, d, "orders")
        .join(big, col("o_orderkey") === col("bk"), "left_semi")
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"))
        .agg(sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderdate").asc,
          col("o_orderkey").asc)
        .limit(100)
    }),

    "q_tpch7" -> ((s, d) => {
      // TPC-H Q7 shape (volume shipping): trade revenue between every
      // (supplier nation, customer nation) pair by ship year — the
      // nation dim joins TWICE under different roles, both broadcast.
      // The classical two-nation filter is dropped: the synthetic FK
      // graph spreads pairs uniformly, so the full ≤25×25×years pair
      // matrix is the meaningful readout; top-20 by revenue.
      val supp = t(s, d, "supplier")
        .join(broadcast(t(s, d, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cust = t(s, d, "customer")
        .join(broadcast(t(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1995-01-01") &&
          col("l_shipdate") < lit("1997-01-01"))
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        .withColumn("l_year", year(col("l_shipdate")))
        .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
        .agg(sum((dec(col("l_extendedprice")) *
          (lit(1).cast("decimal(18,2)") - dec(col("l_discount")))).cast("decimal(30,4)"))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("supp_nation").asc,
          col("cust_nation").asc, col("l_year").asc)
        .limit(20)
    }),

    "q_tpch8" -> ((s, d) => {
      // TPC-H Q8 (national market share): one supplier nation's share
      // of ECONOMY-part revenue sold into AMERICA, per order year —
      // numerator and denominator accumulate in ONE aggregate pass
      // (conditional sum), never two scans; region→nation prune
      // broadcasts up the customer dim chain
      val amCust = t(s, d, "customer")
        .join(broadcast(t(s, d, "nation")
            .join(broadcast(t(s, d, "region")
              .filter(col("r_name") === "AMERICA")),
              col("n_regionkey") === col("r_regionkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"))
      val supp = t(s, d, "supplier")
        .join(broadcast(t(s, d, "nation")
            .withColumnRenamed("n_name", "supp_nation")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("supp_nation"))
      val rev = (dec(col("l_extendedprice")) *
        (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
        .cast("decimal(30,4)")
      t(s, d, "lineitem")
        .join(broadcast(t(s, d, "part").filter(col("p_type") === "ECONOMY")
          .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
        .join(t(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1995-01-01") &&
            col("o_orderdate") < lit("1997-01-01")),
          col("l_orderkey") === col("o_orderkey"))
        .join(amCust, col("o_custkey") === col("c_custkey"), "left_semi")
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        .withColumn("o_year", year(col("o_orderdate")))
        .groupBy(col("o_year"))
        .agg(round(
          sum(when(col("supp_nation") === "NATION_3", rev)
            .otherwise(lit(0).cast("decimal(30,4)"))).cast("double") /
          sum(rev).cast("double"), 6).as("mkt_share"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("o_year").asc)
    }),

    "q_tpch13" -> ((s, d) => {
      // TPC-H Q13 (customer distribution): order count per customer
      // INCLUDING zero-order customers (left outer preserves them),
      // then the count-of-counts histogram — two shuffles total, the
      // second over ≤ max(c_count) rows
      t(s, d, "customer")
        .join(t(s, d, "orders").select(col("o_custkey"), col("o_orderkey")),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    "q_tpch17" -> ((s, d) => {
      // TPC-H Q17 (small-quantity-order revenue): lines of one brand
      // below 20% of their part's average quantity. The correlated avg
      // decorrelates into a per-part aggregate join; the threshold
      // compares CROSS-MULTIPLIED (qty·5·n < Σqty) so both engines
      // decide ties in exact decimal/integer math — no division, no
      // float threshold drift
      val l = t(s, d, "lineitem")
      val perPart = l.groupBy(col("l_partkey").as("pk"))
        .agg(sum(dec(col("l_quantity"))).as("sq"), count(lit(1)).as("nq"))
      l.join(broadcast(t(s, d, "part").filter(col("p_brand") === "Brand#1")
          .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
        .join(perPart, col("l_partkey") === col("pk"))
        .filter(dec(col("l_quantity")) * lit(5) * col("nq") < col("sq"))
        .agg((sum(dec(col("l_extendedprice"))).cast("double") / lit(7.0))
          .as("avg_yearly"), count(lit(1)).as("n_lines"))
    }),

    "q_tpch22" -> ((s, d) => {
      // TPC-H Q22 shape (global sales opportunity): high-balance
      // customers dormant since 2000 (no recent orders), grouped by
      // segment (the data has no phone country code). The
      // above-average-balance test cross-multiplies against the
      // one-row (Σbal, n) aggregate joined on a constant key — a
      // broadcast hash join, not a nested-loop — and the dormancy
      // test is a left anti join on the date-pruned orders scan
      val c = t(s, d, "customer")
      val pos = c.filter(col("c_acctbal") > 0)
        .agg(sum(dec(col("c_acctbal"))).as("tot"), count(lit(1)).as("npos"))
        .withColumn("k", lit(1))
      c.withColumn("k", lit(1))
        .join(broadcast(pos), Seq("k"))
        .filter(dec(col("c_acctbal")) * col("npos") > col("tot"))
        .join(t(s, d, "orders")
          .filter(col("o_orderdate") >= lit("2000-01-01"))
          .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("numcust"),
          sum(dec(col("c_acctbal"))).cast("double").as("totacctbal"))
        .orderBy(col("c_mktsegment").asc)
    }),

    "q_unpivot" -> ((s, d) =>
      // wide→long melt of the lineitem measures (the inverse of
      // q_pivot): Spark's Unpivot node — a zero-shuffle Expand
      t(s, d, "lineitem")
        .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "metric", "value")
        .orderBy("l_orderkey", "l_linenumber", "metric", "value")),

    "q_pagerank" -> ((s, d) => {
      // entity importance over the purchase FK graph: customers link to
      // the suppliers they bought from (bipartite, suppliers dangling —
      // exercises the dangling-mass correction). 3 synchronous steps;
      // per-edge contributions accumulate in decimal, so the unrolled
      // oracle matches byte-for-byte.
      // r18: pin the distinct edge list once — the lazy frame's subtree
      // re-materialized per consumer (nodes/outdeg/per-iteration joins
      // prune it differently, so exchange reuse missed; the job trace
      // showed the join+distinct map stage executing twice)
      val e = t(s, d, "orders")
        .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
        .distinct()
        .localCheckpoint(true)
      graft.ext.Graph.pagerank(e, "src", "dst", iterations = 3)
        .orderBy("node")
    }),

    "q_resample" -> ((s, d) =>
      // hourly regularization of the event stream per type: per-key
      // spine (sequence over each key's own [min,max] slot range — no
      // global-calendar cross join), gap slots surface as null mean /
      // n=0. 34-53 real gaps per type at sf0.01.
      graft.ops.TimeSeries.resample(
        events(s, d).select(col("event_type"),
          expr("unix_micros(ts_us) div 1000000").as("es"), col("value")),
        "event_type", "es", "value", 3600L)
        .orderBy("event_type", "slot")),

    "q_ts_anomaly" -> ((s, d) => {
      // rolling anomaly flags over the hourly grid: each slot scored
      // against the trailing day's mean/std (exclusive window, so a
      // spike can't inflate its own baseline)
      val rs = graft.ops.TimeSeries.resample(
        events(s, d).select(col("event_type"),
          expr("unix_micros(ts_us) div 1000000").as("es"), col("value")),
        "event_type", "es", "value", 3600L)
      graft.ops.TimeSeries.rollingAnomalies(rs, "event_type", "slot",
          "value_avg", window = 24, k = 3.0)
        .select("event_type", "slot", "value_avg", "z", "is_anomaly")
        .orderBy("event_type", "slot")
    }),

    "q_interpolate" -> ((s, d) => {
      // gap repair over the resampled grid: linear interpolation
      // between the nearest observed neighbors, then forward-fill for
      // the trailing edge. Window-only after the resample shuffle.
      val rs = graft.ops.TimeSeries.resample(
        events(s, d).select(col("event_type"),
          expr("unix_micros(ts_us) div 1000000").as("es"), col("value")),
        "event_type", "es", "value", 3600L)
      val interp = graft.ops.TimeSeries.interpolateLinear(
        rs.withColumn("value_interp", col("value_avg")),
        "event_type", "slot", "value_interp")
      graft.ops.TimeSeries.forwardFill(
        interp.withColumn("value_filled", col("value_interp")),
        "event_type", "slot", Seq("value_filled"))
        .select("event_type", "slot", "value_interp", "value_filled")
        .orderBy("event_type", "slot")
    }),

    "q_asof_join" -> ((s, d) => {
      // as-of enrichment: each event gets the latest reference reading
      // (the every-10th event) at or before its timestamp, per user
      val ev = events(s, d).select(col("event_id"), col("user_id"),
        date_trunc("second", col("ts_us")).as("tss"), col("value"))
      val ref = ev.filter(col("event_id") % 10 === 0)
        .groupBy(col("user_id"), col("tss").as("rts"))
        .agg(max(col("value")).as("ref_value"))
      graft.ops.AsOfJoin.asofBackward(ev, ref, "user_id", "tss", "rts", Seq("ref_value"))
        .select("event_id", "user_id", "tss", "ref_value")
        .orderBy("event_id")
    }),

    "q_asof_tolerance" -> ((s, d) => {
      // as-of join with a MATCH TOLERANCE: the latest reference at or
      // before each event counts only if it is ≤ 10 minutes old —
      // stale references null out (the standard telemetry-join
      // semantics; composes from asofBackward by carrying the matched
      // right timestamp as a payload)
      val ev = events(s, d).select(col("event_id"), col("user_id"),
        date_trunc("second", col("ts_us")).as("tss"), col("value"))
      val ref = ev.filter(col("event_id") % 10 === 0)
        .groupBy(col("user_id"), col("tss").as("rts"))
        .agg(max(col("value")).as("ref_value"))
        .withColumn("matched_rts", col("rts"))
      graft.ops.AsOfJoin.asofBackward(ev, ref, "user_id", "tss", "rts",
          Seq("ref_value", "matched_rts"))
        .select(col("event_id"), col("user_id"), col("tss"),
          when(col("matched_rts") >= col("tss") - expr("INTERVAL 10 MINUTES"),
            col("ref_value")).as("ref_value_fresh"))
        .orderBy("event_id")
    }),

    "q_asof_forward" -> ((s, d) => {
      // forward direction: each event gets the EARLIEST reference
      // reading at or after its timestamp ("next reading"), per user —
      // both as-of directions oracle-proven vs DuckDB's native ASOF
      val ev = events(s, d).select(col("event_id"), col("user_id"),
        date_trunc("second", col("ts_us")).as("tss"), col("value"))
      val ref = ev.filter(col("event_id") % 10 === 0)
        .groupBy(col("user_id"), col("tss").as("rts"))
        .agg(max(col("value")).as("ref_value"))
      graft.ops.AsOfJoin.asofForward(ev, ref, "user_id", "tss", "rts", Seq("ref_value"))
        .select("event_id", "user_id", "tss", "ref_value")
        .orderBy("event_id")
    }),

    "q_asof_native" -> ((s, d) => {
      // the SAME as-of enrichment as q_asof_join, executed by the
      // custom whole-operator plan (AsOfJoinNode → AsOfJoinExec via
      // GraftStrategy): one shuffle per side, per-partition streaming
      // merge — proven against DuckDB's native ASOF JOIN like the
      // window-composition form
      val ev = events(s, d).select(col("event_id"), col("user_id"),
        date_trunc("second", col("ts_us")).as("tss"), col("value"))
      val ref = ev.filter(col("event_id") % 10 === 0)
        .groupBy(col("user_id"), col("tss").as("rts"))
        .agg(max(col("value")).as("ref_value"))
      graft.ops.AsOfJoin.asofNative(ev, ref, "user_id", "tss", "rts", Seq("ref_value"))
        .select("event_id", "user_id", "tss", "ref_value")
        .orderBy("event_id")
    }),

    "q_asof_native_fwd" -> ((s, d) => {
      // forward direction through the custom physical operator
      val ev = events(s, d).select(col("event_id"), col("user_id"),
        date_trunc("second", col("ts_us")).as("tss"), col("value"))
      val ref = ev.filter(col("event_id") % 10 === 0)
        .groupBy(col("user_id"), col("tss").as("rts"))
        .agg(max(col("value")).as("ref_value"))
      graft.ops.AsOfJoin.asofNative(ev, ref, "user_id", "tss", "rts", Seq("ref_value"),
          forward = true)
        .select("event_id", "user_id", "tss", "ref_value")
        .orderBy("event_id")
    }),

    "q_fk_orphans" -> ((s, d) => {
      // referential-integrity audit: lineitems without a parent order
      // (plus a synthesized orphan so the check provably fires)
      val o = t(s, d, "orders")
      val li = t(s, d, "lineitem").select("l_orderkey", "l_linenumber")
        .unionByName(s.range(1).select(
          lit(-999L).as("l_orderkey"), lit(1).as("l_linenumber")))
      graft.ops.Validate.fkOrphans(li, o, "l_orderkey", "o_orderkey")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q_percentiles" -> ((s, d) =>
      // exact interpolated percentiles (median/p90) per group
      t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(
          expr("percentile(l_quantity, 0.5)").as("median_qty"),
          expr("percentile(l_quantity, 0.9)").as("p90_qty"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")),

    "q_range_join" -> ((s, d) => {
      // range (band) join: non-equi predicate against a broadcast
      // interval dimension — each order lands in its price band
      val bands = s.createDataFrame(Seq(
        ("small", 0.0, 100000.0),
        ("medium", 100000.0, 250000.0),
        ("large", 250000.0, 1e9)
      )).toDF("band", "lo", "hi")
      val o = t(s, d, "orders")
      o.join(broadcast(bands),
          o("o_totalprice") >= bands("lo") && o("o_totalprice") < bands("hi"))
        .select("o_orderkey", "o_totalprice", "band")
        .orderBy("o_orderkey")
    }),

    "q_share_of_total" -> ((s, d) => {
      // share-of-total: aggregate then window over the aggregate (the
      // "category share" dashboard shape)
      val seg = t(s, d, "orders").join(t(s, d, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(sum(dec(col("o_totalprice"))).as("rev_d"), count(lit(1)).as("n_orders"))
      import org.apache.spark.sql.expressions.Window
      seg.withColumn("revenue", col("rev_d").cast("double"))
        .withColumn("share",
          round(col("rev_d").cast("double") /
            sum(col("rev_d")).over(Window.partitionBy()).cast("double"), 6))
        .select("c_mktsegment", "revenue", "n_orders", "share")
        .orderBy("c_mktsegment")
    }),

    "q_agent_dashboard" -> ((s, d) => {
      // per-supplier performance ranked within nation (the per-agent
      // quality dashboard shape: agent ≈ supplier, team ≈ nation)
      import org.apache.spark.sql.expressions.Window
      val li = t(s, d, "lineitem"); val sup = t(s, d, "supplier"); val nat = t(s, d, "nation")
      val perSupp = li.join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
        .groupBy(col("s_suppkey"), col("s_name"), col("n_name"))
        .agg(
          count(lit(1)).as("n_items"),
          sum(dec(col("l_extendedprice"))).cast("double").as("revenue"),
          (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"))
      val w = Window.partitionBy(col("n_name"))
        .orderBy(col("revenue").desc, col("s_suppkey").asc)
      perSupp.withColumn("rank_in_nation", row_number().over(w))
        .select("s_suppkey", "s_name", "n_name", "n_items", "revenue",
          "avg_qty", "rank_in_nation")
        .orderBy("n_name", "rank_in_nation")
    }),

    "q_rolling_window" -> ((s, d) => {
      // trailing 90-day rolling features per customer (RANGE frame over
      // a day index): the time-series feature shape (trailing spend,
      // order frequency) dashboards and feature pipelines both need.
      // Decimal accumulation keeps the windowed sum independent of tie
      // order within equal dates.
      import org.apache.spark.sql.expressions.Window
      val o = t(s, d, "orders")
        .withColumn("day_idx",
          datediff(col("o_orderdate"), lit("1990-01-01").cast("date")))
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("day_idx"))
        .rangeBetween(-90, 0)
      o.select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          sum(dec(col("o_totalprice"))).over(w).cast("double").as("rev_90d"),
          count(lit(1)).over(w).as("n_90d"))
        .orderBy("o_orderkey")
    }),

    "q_pivot" -> ((s, d) =>
      // channel-keyed pivot (duration_details '0'/'1' shape, schema.py:325)
      t(s, d, "orders").groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(sum(dec(col("o_totalprice"))).cast("double"))
        .orderBy("o_orderpriority")),

    "q_grouping_sets" -> ((s, d) =>
      t(s, d, "lineitem").cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),

    "q_histogram" -> ((s, d) => {
      // equi-width histogram of the price distribution: the bucket
      // arithmetic is hand-rolled (one fixed IEEE expression both
      // engines replay bit-for-bit); AnalyticsSpec proves it matches
      // Spark's width_bucket builtin on the same data
      val v = col("l_extendedprice")
      val lo = lit(900.0); val hi = lit(105000.0); val nb = 20.0
      val bucket = when(v < lo, lit(0L))
        .when(v >= hi, lit(nb.toLong + 1))
        .otherwise(floor(lit(nb) * (v - lo) / (hi - lo)).cast("long") + lit(1L))
      t(s, d, "lineitem").withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("total"))
        .orderBy("bucket")
    }),

    "q_outliers" -> ((s, d) =>
      // per-event-type z-score anomaly screen; decimal-exact moments
      // make the flagged set deterministic at any parallelism and
      // bit-replayable by the oracle
      graft.ops.Validate.zScoreOutliers(events(s, d), "event_type", "value",
          threshold = 2.0)
        .select("event_id", "event_type", "value")
        .orderBy("event_id")),

    "q_funnel" -> ((s, d) => {
      // strictly-ordered view→click→purchase funnel: step i counts
      // only events after the user's step-(i−1) completion time
      val steps = Seq("view", "click", "purchase")
      graft.ext.Behavior.funnelCounts(
        graft.ext.Behavior.funnelUsers(events(s, d), "user_id", "ts_us",
          "event_type", steps), steps)
    }),

    "q_funnel_windowed" -> ((s, d) => {
      // window-bounded funnel: each step counts only within 1 hour of
      // the previous completion ("click within the hour of the view")
      val steps = Seq("view", "click", "purchase")
      graft.ext.Behavior.funnelCounts(
        graft.ext.Behavior.funnelUsers(events(s, d), "user_id", "ts_us",
          "event_type", steps, maxStepGapSeconds = Some(3600L)), steps)
    }),

    "q_retention" -> ((s, d) =>
      // cohort retention curve: users cohorted by first active day,
      // actives counted per (cohort, day offset) cell
      graft.ext.Behavior.retention(events(s, d), "user_id", "ts_us",
        maxOffsetDays = 30)),

    "x_fdr" -> ((s, d) => {
      // Benjamini-Hochberg over 20 per-source "metric p-values" —
      // FNV-millionth buckets are EXACT 6-dp decimals; even-bucket
      // sources get a /100-scaled signal p (bucket%10000/1e6), odd
      // stay null-uniform, so the closure rejects a real mixed set.
      // Acceptance cross-multiplies p*m*qDen <= rank*qNum exactly
      val bucket = pmod(graft.functions.VectorExpressions.fnv1a64(
        concat(col("source"), lit(":7"))), lit(1000000L))
      val p = when(pmod(col("__b"), lit(2)) === 0,
          pmod(col("__b"), lit(10000)).cast("double") / lit(1000000.0))
        .otherwise(col("__b").cast("double") / lit(1000000.0))
      graft.ext.Eval.bhFdr(
        t(s, d, "documents").select(col("source")).distinct()
          .withColumn("__b", bucket).withColumn("p", p),
        "source", "p", qNum = 1L, qDen = 5L)
    }),

    "x_srm" -> ((s, d) =>
      // sample-ratio-mismatch guardrail: event traffic by user parity
      // against the intended 1:1 split — exact-rational expected
      // counts, 9-dp decimal term sums, chi2 vs the df=1 5% critical
      // value. The parity split is near-perfect, so srm_flag = false
      // is the EXPECTED healthy readout
      graft.ext.Eval.chi2GoF(
        events(s, d).select(pmod(col("user_id"), lit(2)).cast("string")
          .as("arm")),
        "arm", Seq("0" -> ((1L, 2L)), "1" -> ((1L, 2L))),
        critValue = 3.841)),

    "x_cuped" -> ((s, d) => {
      // CUPED on the event stream: per-user pre-period activity count
      // (Jan 1-15) as the covariate, post-period count as the metric,
      // arms by user parity — pooled theta from exact integer
      // moments, per-arm raw vs adjusted means, and the
      // variance-reduction readout (100*rho^2)
      val perUser = events(s, d).groupBy(col("user_id"))
        .agg(
          sum(when(col("ts_us") < lit("2024-01-16"), 1L).otherwise(0L))
            .as("x"),
          sum(when(col("ts_us") >= lit("2024-01-16"), 1L).otherwise(0L))
            .as("y"))
        .withColumn("variant",
          when(pmod(col("user_id"), lit(2)) === 0, lit("ctrl"))
            .otherwise(lit("treat")))
      graft.ext.Behavior.cuped(perUser, "variant", "x", "y")
    }),

    "x_did" -> ((s, d) =>
      // difference-in-differences: user-parity "rollout" at Jan 16 —
      // four cell means of the event value at exact 6-dp decimal,
      // the parallel-trends causal estimate as one fixed-shape
      // composition of the cell means
      graft.ext.Behavior.diffInDiff(
        events(s, d).select(
          (pmod(col("user_id"), lit(2)) === 1).as("tr"),
          (col("ts_us") >= lit("2024-01-16")).as("po"),
          col("value")),
        "tr", "po", "value")),

    "x_kaplan_meier" -> ((s, d) =>
      // censoring-aware survival curve: synthetic durations
      // (orderkey mod 53 days) with finished orders as events and
      // open ones as right-censored — at-risk counts from a
      // distinct-duration cumulative frame, the prefix product as a
      // bit-stable ascending fold (no rounding step anywhere)
      graft.ext.Behavior.kaplanMeier(
        t(s, d, "orders").select(
          pmod(col("o_orderkey"), lit(53)).as("dur"),
          (col("o_orderstatus") === "F").as("ev")),
        "dur", "ev")),

    "x_hazard" -> ((s, d) =>
      // Nelson-Aalen cumulative hazard over the same censored
      // durations as x_kaplan_meier — additive counterpart of the KM
      // product: 9-dp increment terms summed in DECIMAL over the
      // distinct-duration frame (sums commute; no fold needed)
      graft.ext.Behavior.nelsonAalen(
        t(s, d, "orders").select(
          pmod(col("o_orderkey"), lit(53)).as("dur"),
          (col("o_orderstatus") === "F").as("ev")),
        "dur", "ev")),

    "x_ohlc" -> ((s, d) =>
      // hourly candlesticks of the event value per type: open/close
      // by min_by/max_by on the (micro-epoch, value) pair — ONE hash
      // aggregate, no window, duplicate-timestamp ties break by value
      graft.ops.TimeSeries.ohlc(
        events(s, d).select(col("event_type"),
          expr("unix_micros(ts_us)").as("eus"), col("value")),
        "event_type", "eus", "value", bucketSize = 3600000000L)),

    "q_transitions" -> ((s, d) =>
      // first-order Markov transition matrix of the event stream:
      // (from, to) counts + per-source-state probability (one lead
      // window on the user shuffle, exact bigint division)
      graft.ext.Behavior.transitions(events(s, d), "user_id", "ts_us",
        "event_type", "event_id")),

    "q_top_paths" -> ((s, d) =>
      // most common 3-step event paths across user sequences — two
      // chained leads over the same user window, count per path
      graft.ext.Behavior.topPaths(events(s, d), "user_id", "ts_us",
        "event_type", "event_id", n = 3, k = 15)),

    "q_active_trailing" -> ((s, d) =>
      // trailing 7-day distinct actives per day via contribution
      // explode — the scalable form of a sliding COUNT DISTINCT (no
      // event-table self-join; shuffle is O(user-days × 7))
      graft.ext.Behavior.activeUsersTrailing(events(s, d), "user_id", "ts_us",
        windowDays = 7)),

    "q_decay_score" -> ((s, d) =>
      // recency-weighted engagement: Σ value/(1+age_days) per user —
      // harmonic decay because division is IEEE-exact everywhere
      // (exp/pow are not correctly rounded and would flake the hash)
      graft.ext.Behavior.decayedEngagement(events(s, d), "user_id", "ts_us",
        "value")),

    "q_twap" -> ((s, d) =>
      // time-weighted average value per user over the µs epoch axis
      // (unique per key here, so the lead order can't tie — and the
      // finest unit DuckDB's TIMESTAMP can replay): each reading holds
      // until the next one — the summary a plain AVG gets wrong under
      // irregular sampling
      graft.ext.Behavior.twap(
        events(s, d).select(col("user_id"), expr("unix_micros(ts_us)").as("tus"),
          col("value")),
        "user_id", "tus", "value")),

    "q_exact_corr" -> ((s, d) =>
      // Pearson correlation of value vs hour-of-day per event type,
      // from EXACT decimal moments — bit-stable under any partitioning
      // (the built-in corr()'s streaming merge is not)
      graft.ext.Behavior.exactCorr(
        events(s, d).select(col("event_type"), col("value"),
          hour(col("ts_us")).as("hod")),
        "event_type", "value", "hod")),

    "q_ab_test" -> ((s, d) =>
      // experiment readout: users split by id parity, conversion =
      // any purchase event; rates, lift, pooled two-proportion z —
      // integer counts through single IEEE divisions and one sqrt,
      // bit-reproducible on any engine (no erf: the statistic is
      // data, the p-value cutoff is the caller's policy)
      graft.ext.Behavior.abTest(
        events(s, d)
          .withColumn("variant",
            when(col("user_id") % 2 === 0, "A").otherwise("B"))
          .withColumn("converted",
            col("event_type") === "purchase" && col("value") > 90),
        "variant", "user_id", "converted")),

    "x_power" -> ((s, d) =>
      // power check beside the q_ab_test readout: per-arm n required
      // to detect the OBSERVED rate gap at two-sided 5% / 80% power,
      // and whether the smaller arm reaches it — exact counts through
      // one fixed double shape, no erf
      graft.ext.Behavior.powerCheck(
        events(s, d)
          .withColumn("variant",
            when(col("user_id") % 2 === 0, "A").otherwise("B"))
          .withColumn("converted",
            col("event_type") === "purchase" && col("value") > 90),
        "variant", "user_id", "converted")),

    "q_rollup_maintain" -> ((s, d) => {
      // incremental-view maintenance: the stored (day, type) rollup of
      // prior syncs merges with the new batch's partial aggregate by
      // additive sum — O(delta) per sync, history never rescanned; the
      // oracle recomputes from ALL raw events, so a hash match proves
      // merge == recompute for this split
      def agg1(df: DataFrame) = df
        .groupBy(to_date(col("ts_us")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).as("v_sum"))
      val ev = events(s, d)
      val store = agg1(ev.filter(col("event_id") % 2 === 0))
      val batch = agg1(ev.filter(col("event_id") % 2 =!= 0))
      graft.sync.Incremental.maintainRollup(store, batch,
          Seq("day", "event_type"), Seq("n", "v_sum"))
        .select(col("day"), col("event_type"), col("n"),
          col("v_sum").cast("double").as("v_sum"))
        .orderBy("day", "event_type")
    }),

    "x_weighted_pct" -> ((s, d) =>
      // token-mass-weighted percentiles: price distribution weighted
      // by quantity — the "median BY MASS, not by row" readout; pure
      // integer weight-rank picks over the distinct-value frame
      graft.ops.Validate.weightedPercentiles(
        t(s, d, "lineitem"), "l_extendedprice", "l_quantity",
        Seq(0.25, 0.5, 0.75, 0.95))),

    "q_quantile_bins" -> ((s, d) =>
      // equal-frequency discretizer: exact-percentile edges broadcast,
      // codegen'd comparison-sum assignment — no global sort (the
      // ntile trap: a partitionless window collapses the table into
      // one partition)
      graft.ops.Validate.quantileBins(
        events(s, d).select(col("event_id"), col("value")), "value", nBins = 10)
        .select(col("event_id"), col("value"), col("bin"),
          round(col("bin_lower"), 6).as("bin_lower"))
        .orderBy("event_id")),

    "q_profile" -> ((s, d) =>
      // one-pass column profile of orders: every metric for every
      // column in a single Aggregate (count/null/distinct/min/max/mean)
      graft.ops.Validate.profile(
        t(s, d, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice",
          "o_orderdate"))),

    "q_winsorize" -> ((s, d) =>
      // percentile clipping: values pinned into [p05, p95] — edges from
      // one exact-percentile aggregate, clipping codegen'd, no shuffle
      graft.ops.Validate.winsorize(
        events(s, d).select(col("event_id"), col("value")), "value",
        lo = 0.05, hi = 0.95)
        .select(col("event_id"), col("value"), round(col("value_w"), 6).as("value_w"))
        .orderBy("event_id")),

    "q_mad_outliers" -> ((s, d) =>
      // robust median/MAD outlier screen over the event values — the
      // long tail distorts a mean/stddev z-score's own baseline, the
      // median's breakdown point doesn't care
      graft.ops.Validate.madOutliers(
        events(s, d).select(col("event_id"), col("value")), "value", k = 3.5)
        .orderBy("event_id")),

    "q_snapshot_diff" -> ((s, d) => {
      // CDC between two simulated snapshot versions of orders: rows
      // keyed %97==3 exist only in "new" (inserts), %89==7 only in
      // "old" (deletes), %11==0 got a price bump (updates with the
      // changed column named) — one full-outer key shuffle, unchanged
      // rows never leave the join
      val base = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val old = base.filter(col("o_orderkey") % 97 =!= 3)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 11 === 0, col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice")))
      val nw = base.filter(col("o_orderkey") % 89 =!= 7)
      graft.ops.Snapshot.diff(old, nw, Seq("o_orderkey"))
        .orderBy("o_orderkey")
    }),

    "q_bloom_prune" -> ((s, d) => {
      // runtime-filter pruning made explicit: Bloom of the urgent
      // orders' keys (one tiny aggregate, rides as a scalar subquery)
      // drops non-matching lineitems BEFORE the join shuffle; false
      // positives are removed by the exact join, so results are
      // byte-identical to the plain join — only the shuffled volume
      // changes
      val urgent = t(s, d, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_orderpriority"))
      val li = t(s, d, "lineitem").select("l_orderkey", "l_quantity", "l_returnflag")
      val pruned = graft.ops.Enrich.bloomPrune(li, urgent, "l_orderkey", "o_orderkey",
        expectedItems = 100000L)
      pruned.join(urgent, pruned("l_orderkey") === urgent("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("l_returnflag")
    }),

    "q_interval_merge" -> ((s, d) => {
      // union of per-user activity spans: each event opens a span of
      // floor(value*10) seconds; overlapping/touching spans stitch
      // into islands (one shuffle + two windows, no self-join)
      val iv = events(s, d).select(col("user_id"),
        expr("unix_micros(ts_us) div 1000000").as("s"),
        (expr("unix_micros(ts_us) div 1000000") +
          floor(col("value") * 10).cast("long")).as("e"))
      graft.ops.Intervals.mergeOverlapping(iv, "user_id", "s", "e")
    }),

    "q_interval_coverage" -> ((s, d) => {
      // per-user coverage rollup over the merged islands
      val iv = events(s, d).select(col("user_id"),
        expr("unix_micros(ts_us) div 1000000").as("s"),
        (expr("unix_micros(ts_us) div 1000000") +
          floor(col("value") * 10).cast("long")).as("e"))
      graft.ops.Intervals.coverage(iv, "user_id", "s", "e")
    }),

    "q_attribution" -> ((s, d) => {
      // last-touch attribution through the NATIVE as-of operator:
      // each purchase joins the latest preceding non-purchase event of
      // the same user (the "touch"), credited only within a 30-minute
      // window; conversions count per touch type
      val ev = events(s, d).select(col("event_id"), col("user_id"),
        date_trunc("second", col("ts_us")).as("tss"),
        col("event_type"), col("value"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "tss", "value")
      val touches = ev.filter(col("event_type") =!= "purchase")
        .groupBy(col("user_id"), col("tss").as("touch_ts"))
        .agg(max(col("event_type")).as("touch_type"))
      graft.ops.AsOfJoin.asofNative(purchases, touches,
          "user_id", "tss", "touch_ts", Seq("touch_type", "touch_ts"))
        .withColumn("attributed",
          when(col("touch_ts") >= col("tss") - expr("INTERVAL 30 MINUTES"),
            col("touch_type")).otherwise(lit("none")))
        .groupBy(col("attributed"))
        .agg(count(lit(1)).as("conversions"), dsum(col("value")).as("revenue"))
        .orderBy("attributed")
    }),

    "q_golden_record" -> ((s, d) => {
      // survivorship: two synthetic variants of every customer (one
      // with a nulled segment, one with a truncated name and stale
      // balance) merge back into a golden record per cluster — one
      // codegen'd max_by aggregation, null values demoted below any
      // real one
      import graft.ext.Linkage._
      val c = t(s, d, "customer")
      val v1 = c.select(col("c_custkey"), lit(1L).as("seq"),
        col("c_name").as("name"),
        when(col("c_custkey") % 3 === 0, lit(null).cast("string"))
          .otherwise(col("c_mktsegment")).as("seg"),
        col("c_acctbal").as("bal"))
      val v2 = c.select(col("c_custkey"), lit(2L).as("seq"),
        col("c_name").substr(lit(1), lit(10)).as("name"),
        col("c_mktsegment").as("seg"),
        (col("c_acctbal") - 5.0).as("bal"))
      goldenRecordWithCount(v1.unionByName(v2), "c_custkey", Map(
        "name" -> LongestString,
        "seg" -> MostRecentBy("seq"),
        "bal" -> MaxValue))
        .orderBy("c_custkey")
    }),

    "q_scd2_merge" -> ((s, d) => {
      // SCD2 dimension merge: even custkeys form the current table
      // (with closed history for %7 keys), the updates batch renames
      // the segment of %3 keys and introduces odd %5<3 keys — one
      // full-outer join, double-rows via compacted struct-array explode
      val ts = (x: String) => lit(x).cast("timestamp")
      val cust = t(s, d, "customer")
      val open = cust.filter(col("c_custkey") % 2 === 0)
        .select(col("c_custkey"), col("c_mktsegment").as("segment"),
          ts("2020-01-01 00:00:00").as("valid_from"),
          lit(null).cast("timestamp").as("valid_to"))
      val closedHist = cust.filter(col("c_custkey") % 2 === 0 && col("c_custkey") % 7 === 0)
        .select(col("c_custkey"), lit("OLD").as("segment"),
          ts("2019-01-01 00:00:00").as("valid_from"),
          ts("2020-01-01 00:00:00").as("valid_to"))
      val updates = cust.filter(col("c_custkey") % 5 < 3)
        .select(col("c_custkey"),
          when(col("c_custkey") % 3 === 0, lit("CHANGED"))
            .otherwise(col("c_mktsegment")).as("segment"),
          ts("2021-06-01 00:00:00").as("eff"))
      graft.ops.Scd2.merge(open.unionByName(closedHist), updates,
          Seq("c_custkey"), Seq("segment"), "eff")
        .orderBy("c_custkey", "valid_from")
    }),

    "q_dim_history" -> ((s, d) =>
      // SCD2 interval reconstruction from a changelog: per-user
      // event_type state history with consecutive-duplicate collapse;
      // (ts, event_id) tie-break keeps boundaries deterministic
      graft.ops.Scd2.fromChangelog(
          events(s, d).withColumn("ts", col("ts_us")),
          Seq("user_id"), Seq("event_type"), "ts", "event_id")
        .orderBy("user_id", "valid_from", "event_type"))
  )

  val oracles: Map[String, String] = Map(
    // the q_sql_* oracles are the IDENTICAL statements the engine runs
    // through spark.sql — one text, two engines, one hash
    "q_sql_star_agg" ->
      """SELECT n.n_name, date_trunc('month', o.o_orderdate) AS month,
        |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  count(DISTINCT o.o_orderkey) AS n_orders
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE o.o_orderdate >= TIMESTAMP '1995-01-01' AND o.o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n.n_name, date_trunc('month', o.o_orderdate)
        |ORDER BY n_name, month""".stripMargin,

    // one text, two engines: the correlated EXISTS/NOT EXISTS pair runs
    // verbatim in DuckDB
    "q_sql_exists" ->
      """SELECT s_name, count(*) AS n
        |FROM supplier, lineitem l1, orders
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        |  AND EXISTS (SELECT * FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT * FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > l1.l_shipdate)
        |GROUP BY s_name ORDER BY n DESC, s_name LIMIT 20""".stripMargin,

    "q_sql_recursive" ->
      """WITH RECURSIVE tree AS (
        |  SELECT c_custkey AS node, 0 AS depth FROM customer WHERE c_custkey = 0
        |  UNION ALL
        |  SELECT c.c_custkey AS node, t.depth + 1 AS depth
        |  FROM customer c JOIN tree t
        |    ON CAST(floor(CAST(c.c_custkey AS DOUBLE) / 2) AS BIGINT) = t.node
        |  WHERE c.c_custkey > 0)
        |SELECT depth, count(*) AS n, CAST(sum(node) AS BIGINT) AS key_sum
        |FROM tree GROUP BY depth ORDER BY depth""".stripMargin,

    "q_sql_running_total" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE)
        |    AS running_total
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_sql_topk_users" ->
      """SELECT event_type, user_id, n, CAST(rk AS INTEGER) AS rk FROM (
        |  SELECT event_type, user_id, n,
        |    row_number() OVER (PARTITION BY event_type ORDER BY n DESC, user_id) AS rk
        |  FROM (SELECT event_type, user_id, count(*) AS n
        |        FROM events GROUP BY 1, 2))
        |WHERE rk <= 5 ORDER BY event_type, rk""".stripMargin,

    "q_union_pages" ->
      """SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 2 = 0
        |UNION ALL SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 2 <> 0
        |ORDER BY o_orderkey""".stripMargin,

    "q_rollup_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rk AS INTEGER) AS rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        |  FROM orders) WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,

    // p_name is [a-z ]: form-encoding is exactly space→'+'
    "q_url_codec" ->
      """SELECT p_partkey, replace(p_name, ' ', '+') AS enc, p_name AS roundtrip
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_rolling_window" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_custkey, o_orderdate,
        |    datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS day_idx,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS p
        |  FROM orders)
        |SELECT o_orderkey, o_custkey, o_orderdate,
        |  CAST(sum(p) OVER w AS DOUBLE) AS rev_90d,
        |  count(*) OVER w AS n_90d
        |FROM o
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY day_idx
        |             RANGE BETWEEN 90 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,

    "q_paged_extract" ->
      "SELECT doc_id, lang, n_chars FROM documents ORDER BY doc_id",

    "q_paged_scan_v2" ->
      "SELECT doc_id, lang, n_chars FROM documents ORDER BY doc_id",

    "q_paged_manifest" ->
      """SELECT * FROM (VALUES ('manifest_pages_match', TRUE),
        |  ('manifest_rows_match', TRUE), ('pages_contiguous', TRUE),
        |  ('terminator_present', TRUE))
        |AS t(check_name, ok) ORDER BY check_name""".stripMargin,

    "q_events_daily" ->
      """SELECT date_trunc('day', ts) AS day, count(*) AS n, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,

    "q_corrupt_records" ->
      """SELECT lang, (doc_id % 7 = 0) AS corrupt, count(*) AS n_rows,
        |  CAST(sum(CASE WHEN doc_id % 7 = 0 THEN NULL ELSE n_chars END) AS BIGINT) AS n_sum
        |FROM documents GROUP BY lang, corrupt ORDER BY lang, corrupt""".stripMargin,

    // the CDC round-trip law: apply(diffFull(corrupted, truth)) == truth
    "q_cdc_apply" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    // Mann-Whitney replay: 6-dp-rounded distinct-score groups (the
    // engine's bounded-domain contract; VARCHAR->DECIMAL(38,30) is the
    // faithful replay of Spark's shortest-repr HALF_UP round),
    // negatives-below window, doubled half-tie credit in HUGEINT
    // (== the engine's decimal), one double division
    "q_auc" ->
      """WITH e AS (
        |  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
        |    CAST(round(CAST(CAST(value / (value + 100.0) AS VARCHAR) AS DECIMAL(38,30)), 6) AS DOUBLE) AS s
        |  FROM events),
        |g AS (
        |  SELECT s, CAST(sum(y) AS BIGINT) AS np_s, CAST(count(*) - sum(y) AS BIGINT) AS nn_s
        |  FROM e GROUP BY s),
        |a AS (
        |  SELECT s, np_s, nn_s,
        |    coalesce(sum(nn_s) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nb
        |  FROM g),
        |t AS (
        |  SELECT CAST(sum(np_s) AS BIGINT) AS n_pos, CAST(sum(nn_s) AS BIGINT) AS n_neg,
        |    sum(CAST(np_s AS HUGEINT) * (2 * nb + nn_s)) AS c2
        |  FROM a)
        |SELECT n_pos, n_neg,
        |  CASE WHEN n_pos > 0 AND n_neg > 0
        |       THEN round(CAST(c2 AS DOUBLE) / (CAST(2 AS DOUBLE) * n_pos * n_neg), 6) END AS auc
        |FROM t""".stripMargin,

    // binned-AUC replay: clamp->bin, then the identical Mann-Whitney
    // over bin ids (integer math end to end, one double division)
    "q_auc_binned" ->
      """WITH e AS (
        |  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
        |    CAST(l_partkey % 997 AS DOUBLE) / 997.0 AS s
        |  FROM lineitem),
        |g AS (
        |  SELECT greatest(0, least(CAST(floor(s * 256) AS INTEGER), 255)) AS b,
        |    CAST(sum(y) AS BIGINT) AS np_s, CAST(count(*) - sum(y) AS BIGINT) AS nn_s
        |  FROM e GROUP BY 1),
        |a AS (
        |  SELECT b, np_s, nn_s,
        |    coalesce(sum(nn_s) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nb
        |  FROM g),
        |t AS (
        |  SELECT CAST(sum(np_s) AS BIGINT) AS n_pos, CAST(sum(nn_s) AS BIGINT) AS n_neg,
        |    sum(CAST(np_s AS HUGEINT) * (2 * nb + nn_s)) AS c2
        |  FROM a)
        |SELECT n_pos, n_neg,
        |  CASE WHEN n_pos > 0 AND n_neg > 0
        |       THEN round(CAST(c2 AS DOUBLE) / (CAST(2 AS DOUBLE) * n_pos * n_neg), 6) END AS auc_binned
        |FROM t""".stripMargin,

    // average-precision replay: same 6-dp score groups as q_auc, one
    // cumulative window DESC over the groups, 9-dp terms in decimal,
    // /n_pos factored out to the single final division
    "q_avg_precision" ->
      """WITH e AS (
        |  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
        |    CAST(round(CAST(CAST(value / (value + 100.0) AS VARCHAR) AS DECIMAL(38,30)), 6) AS DOUBLE) AS s
        |  FROM events),
        |g AS (
        |  SELECT s, CAST(sum(y) AS BIGINT) AS np_s, CAST(count(*) - sum(y) AS BIGINT) AS nn_s
        |  FROM e GROUP BY s),
        |a AS (
        |  SELECT np_s, nn_s,
        |    sum(np_s) OVER (ORDER BY s DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tp,
        |    sum(np_s + nn_s) OVER (ORDER BY s DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_all
        |  FROM g),
        |m AS (
        |  SELECT np_s, nn_s,
        |    round(CAST(np_s AS DOUBLE) * cum_tp / cum_all, 9) AS term
        |  FROM a)
        |SELECT CAST(sum(np_s) AS BIGINT) AS n_pos, CAST(sum(nn_s) AS BIGINT) AS n_neg,
        |  CASE WHEN sum(np_s) > 0
        |       THEN round(CAST(sum(CAST(term AS DECIMAL(38,9))) AS DOUBLE) / sum(np_s), 6) END AS ap
        |FROM m""".stripMargin,

    // kappa replay: same contingency cells, margins, HUGEINT peNum;
    // kappa = (agree*n - peNum)/(n^2 - peNum), exact to one division
    "q_kappa" ->
      """WITH e AS (
        |  SELECT event_type AS a,
        |    CASE WHEN event_id % 10 < 7 THEN event_type ELSE 'view' END AS b
        |  FROM events),
        |ct AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c FROM e GROUP BY a, b),
        |rt AS (SELECT a AS lab, CAST(sum(c) AS BIGINT) AS ra FROM ct GROUP BY a),
        |cl AS (SELECT b AS lab, CAST(sum(c) AS BIGINT) AS cb FROM ct GROUP BY b),
        |pe AS (
        |  SELECT coalesce(sum(CAST(ra AS HUGEINT) * cb), 0) AS pe_num
        |  FROM rt JOIN cl USING (lab)),
        |t AS (
        |  SELECT CAST(sum(c) AS BIGINT) AS n,
        |    CAST(coalesce(sum(CASE WHEN a = b THEN c END), 0) AS BIGINT) AS agree
        |  FROM ct)
        |SELECT n, round(CAST(agree AS DOUBLE) / n, 6) AS po,
        |  round(CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS pe,
        |  CASE WHEN CAST(n AS HUGEINT) * n <> pe_num
        |       THEN round(CAST(CAST(agree AS HUGEINT) * n - pe_num AS DOUBLE)
        |                  / CAST(CAST(n AS HUGEINT) * n - pe_num AS DOUBLE), 6) END AS kappa
        |FROM t, pe""".stripMargin,

    // chi2 replay: full margin cross product incl. observed-zero cells,
    // identical e = rx*cy/n double arithmetic, 9-dp decimal term sums
    "q_chi2" ->
      """WITH e AS (
        |  SELECT event_type AS x, CAST(user_id % 4 AS VARCHAR) AS y FROM events),
        |ct AS (SELECT x, y, CAST(count(*) AS BIGINT) AS c FROM e GROUP BY x, y),
        |rt AS (SELECT x, CAST(sum(c) AS BIGINT) AS rx FROM ct GROUP BY x),
        |cl AS (SELECT y, CAST(sum(c) AS BIGINT) AS cy FROM ct GROUP BY y),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM ct),
        |cells AS (
        |  SELECT rt.x, cl.y, rt.rx, cl.cy, coalesce(ct.c, 0) AS o, tot.n,
        |    CAST(rt.rx AS DOUBLE) * CAST(cl.cy AS DOUBLE) / CAST(tot.n AS DOUBLE) AS ex
        |  FROM rt CROSS JOIN cl
        |  LEFT JOIN ct ON ct.x = rt.x AND ct.y = cl.y
        |  CROSS JOIN tot),
        |terms AS (
        |  SELECT n, x, y,
        |    round((CAST(o AS DOUBLE) - ex) * (CAST(o AS DOUBLE) - ex) / ex, 9) AS term
        |  FROM cells)
        |SELECT max(n) AS n,
        |  CAST((count(DISTINCT x) - 1) * (count(DISTINCT y) - 1) AS BIGINT) AS dof,
        |  round(CAST(sum(CAST(term AS DECIMAL(38,9))) AS DOUBLE), 6) AS chi2
        |FROM terms""".stripMargin,

    // MI replay over the same contingency: observed cells only, ln at
    // 9 dp and every double round via the VARCHAR->DECIMAL(38,30)
    // trick (Java HALF_UP on the shortest repr), 12-dp decimal term
    // sums, NMI divides the already-rounded metrics
    "x_mutual_info" ->
      """WITH e AS (
        |  SELECT event_type AS x, CAST(user_id % 4 AS VARCHAR) AS y FROM events),
        |ct AS (SELECT x, y, CAST(count(*) AS BIGINT) AS c FROM e GROUP BY x, y),
        |rt AS (SELECT x, CAST(sum(c) AS BIGINT) AS rx FROM ct GROUP BY x),
        |cl AS (SELECT y, CAST(sum(c) AS BIGINT) AS cy FROM ct GROUP BY y),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM ct),
        |mi AS (
        |  SELECT max(n) AS n, count(*) AS n_cells,
        |    CAST(round(CAST(CAST(CAST(sum(CAST(round(CAST(CAST(
        |      (CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) *
        |        CAST(round(CAST(CAST(ln((CAST(c AS DOUBLE) * CAST(n AS DOUBLE)) /
        |          (CAST(rx AS DOUBLE) * CAST(cy AS DOUBLE)))
        |          AS VARCHAR) AS DECIMAL(38,30)), 9) AS DOUBLE)
        |      AS VARCHAR) AS DECIMAL(38,30)), 12) AS DECIMAL(38,12)))
        |      AS DOUBLE) AS VARCHAR) AS DECIMAL(38,30)), 6) AS DOUBLE) AS mi
        |  FROM ct JOIN rt USING (x) JOIN cl USING (y) CROSS JOIN tot),
        |hx AS (
        |  SELECT CAST(round(CAST(CAST(CAST(sum(CAST(round(CAST(CAST(
        |      (CAST(rx AS DOUBLE) / CAST(n AS DOUBLE)) *
        |        CAST(round(CAST(CAST(ln(CAST(n AS DOUBLE) / CAST(rx AS DOUBLE))
        |          AS VARCHAR) AS DECIMAL(38,30)), 9) AS DOUBLE)
        |      AS VARCHAR) AS DECIMAL(38,30)), 12) AS DECIMAL(38,12)))
        |      AS DOUBLE) AS VARCHAR) AS DECIMAL(38,30)), 6) AS DOUBLE) AS hx
        |  FROM rt CROSS JOIN tot),
        |hy AS (
        |  SELECT CAST(round(CAST(CAST(CAST(sum(CAST(round(CAST(CAST(
        |      (CAST(cy AS DOUBLE) / CAST(n AS DOUBLE)) *
        |        CAST(round(CAST(CAST(ln(CAST(n AS DOUBLE) / CAST(cy AS DOUBLE))
        |          AS VARCHAR) AS DECIMAL(38,30)), 9) AS DOUBLE)
        |      AS VARCHAR) AS DECIMAL(38,30)), 12) AS DECIMAL(38,12)))
        |      AS DOUBLE) AS VARCHAR) AS DECIMAL(38,30)), 6) AS DOUBLE) AS hy
        |  FROM cl CROSS JOIN tot)
        |SELECT n, n_cells, hx, hy, mi,
        |  CASE WHEN hx > 0 AND hy > 0 THEN
        |    CAST(round(CAST(CAST(mi / sqrt(hx * hy) AS VARCHAR)
        |      AS DECIMAL(38,30)), 6) AS DOUBLE) END AS nmi
        |FROM mi CROSS JOIN hx CROSS JOIN hy""".stripMargin,

    // KS replay: same bin shape, integer cross-multiplied CDF gaps in
    // HUGEINT, one final division; sqrt is correctly-rounded IEEE on
    // both engines, final 6-dp rounds via the VARCHAR trick
    "x_ks_test" ->
      """WITH o AS (
        |  SELECT greatest(0, least(CAST(floor((o_totalprice - 0.0) / 500000.0 * 1024)
        |      AS INTEGER), 1023)) AS bin,
        |    o_orderpriority AS g
        |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
        |b AS (
        |  SELECT bin,
        |    CAST(count(CASE WHEN g = '1-URGENT' THEN 1 END) AS BIGINT) AS ca,
        |    CAST(count(CASE WHEN g = '5-LOW' THEN 1 END) AS BIGINT) AS cb
        |  FROM o GROUP BY bin),
        |c AS (
        |  SELECT bin, ca, cb,
        |    CAST(sum(ca) OVER (ORDER BY bin) AS BIGINT) AS cum_a,
        |    CAST(sum(cb) OVER (ORDER BY bin) AS BIGINT) AS cum_b,
        |    CAST(sum(ca) OVER () AS BIGINT) AS ta,
        |    CAST(sum(cb) OVER () AS BIGINT) AS tb
        |  FROM b),
        |s AS (
        |  SELECT max(ta) AS na, max(tb) AS nb,
        |    CAST(count(*) AS BIGINT) AS n_bins_used,
        |    max(abs(CAST(cum_a AS HUGEINT) * tb - CAST(cum_b AS HUGEINT) * ta))
        |      AS d_num
        |  FROM c)
        |SELECT na, nb, n_bins_used,
        |  CASE WHEN na > 0 AND nb > 0 THEN
        |    CAST(round(CAST(CAST(CAST(d_num AS DOUBLE) /
        |      (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS VARCHAR)
        |      AS DECIMAL(38,30)), 6) AS DOUBLE) END AS d,
        |  CASE WHEN na > 0 AND nb > 0 THEN
        |    CAST(round(CAST(CAST(
        |      sqrt((CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) /
        |        CAST(na + nb AS DOUBLE)) *
        |      (CAST(d_num AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)))
        |      AS VARCHAR) AS DECIMAL(38,30)), 6) AS DOUBLE) END AS ks_stat
        |FROM s""".stripMargin,

    // clustering-eval replay: doubled pair counts c·(c−1) in HUGEINT
    // (the sufficient statistics — no pair enumeration either side),
    // fixed double shapes over exact integers, 6-dp VARCHAR rounds
    "x_cluster_eval" ->
      """WITH ct AS (
        |  SELECT c_mktsegment AS p, CAST(c_nationkey AS VARCHAR) AS t,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM customer GROUP BY p, t),
        |s1 AS (SELECT CAST(sum(c) AS BIGINT) AS n,
        |         sum(CAST(c AS HUGEINT) * (c - 1)) AS s_cells FROM ct),
        |pa AS (SELECT p, CAST(sum(c) AS BIGINT) AS a FROM ct GROUP BY p),
        |s2 AS (SELECT CAST(count(*) AS BIGINT) AS n_pred,
        |         sum(CAST(a AS HUGEINT) * (a - 1)) AS s_pred FROM pa),
        |tb AS (SELECT t, CAST(sum(c) AS BIGINT) AS b FROM ct GROUP BY t),
        |s3 AS (SELECT CAST(count(*) AS BIGINT) AS n_truth,
        |         sum(CAST(b AS HUGEINT) * (b - 1)) AS s_truth FROM tb),
        |j AS (
        |  SELECT n, n_pred, n_truth,
        |    CAST(s_cells AS DOUBLE) AS sc, CAST(s_pred AS DOUBLE) AS sp,
        |    CAST(s_truth AS DOUBLE) AS st, s_pred AS spi, s_truth AS sti,
        |    (CAST(s_pred AS DOUBLE) * CAST(s_truth AS DOUBLE)) /
        |      (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS e
        |  FROM s1 CROSS JOIN s2 CROSS JOIN s3)
        |SELECT n, n_pred, n_truth,
        |  CASE WHEN spi > 0 THEN CAST(round(CAST(CAST(sc / sp AS VARCHAR)
        |    AS DECIMAL(38,30)), 6) AS DOUBLE) END AS precision,
        |  CASE WHEN sti > 0 THEN CAST(round(CAST(CAST(sc / st AS VARCHAR)
        |    AS DECIMAL(38,30)), 6) AS DOUBLE) END AS recall,
        |  CASE WHEN spi + sti > 0 THEN CAST(round(CAST(CAST(
        |    2.0 * sc / (sp + st) AS VARCHAR)
        |    AS DECIMAL(38,30)), 6) AS DOUBLE) END AS f1,
        |  CASE WHEN abs((sp + st) / 2.0 - e) > 0 THEN
        |    CAST(round(CAST(CAST((sc - e) / ((sp + st) / 2.0 - e) AS VARCHAR)
        |      AS DECIMAL(38,30)), 6) AS DOUBLE) END AS ari
        |FROM j""".stripMargin,

    // calibration replay: same bin clamp, same 6-dp decimal score
    // mass, same 9-dp gap rounding, same single final division
    // conformal replay: 6-dp distinct-value cumulative frame, the
    // prev_cum < rk <= cum pick, eval coverage per alpha
    "x_conformal" ->
      """WITH e AS (
        |  SELECT CAST(round(CAST(CAST(CAST(l_partkey % 997 AS DOUBLE) / 997.0 AS VARCHAR) AS DECIMAL(38,30)), 6) AS DECIMAL(18,6)) AS s,
        |    l_orderkey % 2 = 0 AS cal
        |  FROM lineitem),
        |nc AS (SELECT CAST(count(*) AS BIGINT) AS n_calib FROM e WHERE cal),
        |cd AS (SELECT s, CAST(count(*) AS BIGINT) AS c FROM e WHERE cal GROUP BY s),
        |cum AS (
        |  SELECT s, c, sum(c) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) AS cumc
        |  FROM cd),
        |al AS (SELECT unnest(CAST([0.05, 0.1, 0.25] AS DOUBLE[])) AS alpha),
        |ranks AS (
        |  SELECT alpha, n_calib,
        |    CAST(ceil(CAST(n_calib + 1 AS DOUBLE) * (1.0 - alpha)) AS BIGINT) AS rk
        |  FROM al CROSS JOIN nc),
        |picks AS (
        |  SELECT r.alpha, min(cum.s) AS qhat
        |  FROM ranks r JOIN cum ON cum.cumc >= r.rk AND cum.cumc - cum.c < r.rk
        |  GROUP BY r.alpha),
        |ed AS (SELECT s, CAST(count(*) AS BIGINT) AS ce FROM e WHERE NOT cal GROUP BY s),
        |cov AS (
        |  SELECT r.alpha, r.n_calib, r.rk, p.qhat,
        |    CAST(sum(ed.ce) AS BIGINT) AS n_eval,
        |    CAST(sum(CASE WHEN p.qhat IS NOT NULL AND ed.s <= p.qhat THEN ed.ce ELSE 0 END) AS BIGINT) AS covc
        |  FROM ranks r LEFT JOIN picks p ON r.alpha = p.alpha CROSS JOIN ed
        |  GROUP BY 1, 2, 3, 4)
        |SELECT alpha, n_calib, rk, CAST(qhat AS DOUBLE) AS qhat, n_eval,
        |  CASE WHEN qhat IS NOT NULL THEN round(CAST(covc AS DOUBLE) / n_eval, 6) END AS coverage
        |FROM cov ORDER BY alpha""".stripMargin,

    // confident-joint replay: 6-dp class probabilities, exact-decimal
    // cross-multiplied thresholds, first-declared-wins argmax
    "x_label_noise" ->
      """WITH e AS (
        |  SELECT CASE WHEN (l_partkey + l_linenumber) % 10 = 0
        |              THEN (CASE l_returnflag WHEN 'A' THEN 'N' WHEN 'N' THEN 'R' ELSE 'A' END)
        |              ELSE l_returnflag END AS y,
        |    l_returnflag AS yt,
        |    l_partkey % 5 + 1 AS wa, l_suppkey % 5 + 1 AS wn, l_orderkey % 5 + 1 AS wr
        |  FROM lineitem),
        |p AS (
        |  SELECT y,
        |    CAST(round(CAST(CAST(CAST(wa + (CASE WHEN yt = 'A' THEN 4 ELSE 0 END) AS DOUBLE) / (wa + wn + wr + 4) AS VARCHAR) AS DECIMAL(38,30)), 6) AS DECIMAL(18,6)) AS pa,
        |    CAST(round(CAST(CAST(CAST(wn + (CASE WHEN yt = 'N' THEN 4 ELSE 0 END) AS DOUBLE) / (wa + wn + wr + 4) AS VARCHAR) AS DECIMAL(38,30)), 6) AS DECIMAL(18,6)) AS pn,
        |    CAST(round(CAST(CAST(CAST(wr + (CASE WHEN yt = 'R' THEN 4 ELSE 0 END) AS DOUBLE) / (wa + wn + wr + 4) AS VARCHAR) AS DECIMAL(38,30)), 6) AS DECIMAL(18,6)) AS pr
        |  FROM e),
        |t AS (
        |  SELECT sum(CASE WHEN y = 'A' THEN pa END) AS sa,
        |    CAST(count(*) FILTER (WHERE y = 'A') AS BIGINT) AS na,
        |    sum(CASE WHEN y = 'N' THEN pn END) AS sn,
        |    CAST(count(*) FILTER (WHERE y = 'N') AS BIGINT) AS nn,
        |    sum(CASE WHEN y = 'R' THEN pr END) AS sr,
        |    CAST(count(*) FILTER (WHERE y = 'R') AS BIGINT) AS nr
        |  FROM p),
        |q AS (
        |  SELECT y, pa, pn, pr,
        |    coalesce(pa * na >= sa, FALSE) AS qa,
        |    coalesce(pn * nn >= sn, FALSE) AS qn,
        |    coalesce(pr * nr >= sr, FALSE) AS qr
        |  FROM p CROSS JOIN t),
        |sug AS (
        |  SELECT y,
        |    CASE WHEN qa AND (NOT qn OR pn <= pa) AND (NOT qr OR pr <= pa) THEN 'A'
        |         WHEN qn AND (NOT qr OR pr <= pn) THEN 'N'
        |         WHEN qr THEN 'R' END AS s
        |  FROM q),
        |tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(count(*) FILTER (WHERE s IS NOT NULL) AS BIGINT) AS n_confident,
        |    CAST(count(*) FILTER (WHERE s IS NOT NULL AND s != y) AS BIGINT) AS off
        |  FROM sug)
        |SELECT y AS given, s AS suggested, CAST(count(*) AS BIGINT) AS n,
        |  round(CAST(count(*) AS DOUBLE) / n_confident, 6) AS frac,
        |  n_rows, n_confident,
        |  round(CAST(off AS DOUBLE) / n_confident, 6) AS noise_frac
        |FROM sug CROSS JOIN tot
        |WHERE s IS NOT NULL
        |GROUP BY y, s, n_rows, n_confident, off
        |ORDER BY given, suggested""".stripMargin,

    "q_ece" ->
      """WITH e AS (
        |  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
        |    CAST(l_partkey % 997 AS DOUBLE) / 997.0 AS s
        |  FROM lineitem),
        |b AS (
        |  SELECT greatest(0, least(CAST(floor(s * 10) AS INTEGER), 9)) AS bin,
        |    CAST(least(greatest(s, 0), 1) AS DECIMAL(18,6)) AS sd, y
        |  FROM e),
        |g AS (
        |  SELECT bin, CAST(count(*) AS BIGINT) AS n, sum(sd) AS ssum,
        |    CAST(sum(y) AS BIGINT) AS ypos
        |  FROM b GROUP BY bin),
        |p AS (
        |  SELECT n,
        |    round(abs(CAST(ssum AS DOUBLE) / n - CAST(ypos AS DOUBLE) / n), 9) AS gap
        |  FROM g)
        |SELECT CAST(sum(n) AS BIGINT) AS n,
        |  CAST(count(*) AS BIGINT) AS n_bins_used,
        |  round(CAST(sum(CAST(CAST(gap AS DECIMAL(18,9)) * n AS DECIMAL(38,9))) AS DOUBLE) / sum(n), 6) AS ece,
        |  round(max(gap), 6) AS mce
        |FROM p""".stripMargin,

    // reliability-diagram replay: q_ece's clamp/bin CTEs, per-bin rows
    "q_reliability" ->
      """WITH e AS (
        |  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
        |    CAST(l_partkey % 997 AS DOUBLE) / 997.0 AS s
        |  FROM lineitem),
        |b AS (
        |  SELECT greatest(0, least(CAST(floor(s * 10) AS INTEGER), 9)) AS bin,
        |    CAST(least(greatest(s, 0), 1) AS DECIMAL(18,6)) AS sd, y
        |  FROM e),
        |g AS (
        |  SELECT bin, CAST(count(*) AS BIGINT) AS n, sum(sd) AS ssum,
        |    CAST(sum(y) AS BIGINT) AS ypos
        |  FROM b GROUP BY bin)
        |SELECT CAST(bin AS INTEGER) AS bin, n,
        |  round(CAST(ssum AS DOUBLE) / n, 9) AS conf,
        |  round(CAST(ypos AS DOUBLE) / n, 9) AS acc,
        |  round(abs(CAST(ssum AS DOUBLE) / n - CAST(ypos AS DOUBLE) / n), 9) AS gap
        |FROM g ORDER BY bin""".stripMargin,

    // Spearman replay: same 6-dp parity rounding, same distinct-value
    // doubled average ranks (2*cum - c + 1, exact integers), HUGEINT
    // moments, one double conversion
    "q_spearman" ->
      """WITH b AS (
        |  SELECT CAST(round(CAST(CAST(l_quantity AS VARCHAR) AS DECIMAL(38,30)), 6) AS DOUBLE) AS x,
        |    CAST(round(CAST(CAST(l_extendedprice AS VARCHAR) AS DECIMAL(38,30)), 6) AS DOUBLE) AS y
        |  FROM lineitem),
        |gx AS (SELECT x, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY x),
        |rx AS (
        |  SELECT x, 2 * sum(c) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c + 1 AS r_x
        |  FROM gx),
        |gy AS (SELECT y, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY y),
        |ry AS (
        |  SELECT y, 2 * sum(c) OVER (ORDER BY y ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c + 1 AS r_y
        |  FROM gy),
        |j AS (SELECT rx.r_x, ry.r_y FROM b JOIN rx USING (x) JOIN ry USING (y)),
        |m AS (
        |  SELECT CAST(count(*) AS HUGEINT) AS n,
        |    sum(CAST(r_x AS HUGEINT)) AS sx, sum(CAST(r_y AS HUGEINT)) AS sy,
        |    sum(CAST(r_x AS HUGEINT) * r_y) AS sxy,
        |    sum(CAST(r_x AS HUGEINT) * r_x) AS sxx,
        |    sum(CAST(r_y AS HUGEINT) * r_y) AS syy
        |  FROM j)
        |SELECT CAST(n AS BIGINT) AS n,
        |  CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
        |       THEN round(CAST(n * sxy - sx * sy AS DOUBLE) /
        |                  (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
        |                   sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) END AS spearman
        |FROM m""".stripMargin,

    "q_confusion" ->
      """WITH e AS (
        |  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
        |    CAST(l_partkey % 997 AS DOUBLE) / 997.0 AS s
        |  FROM lineitem),
        |th AS (SELECT unnest([0.25, 0.5, 0.75]) AS threshold),
        |c AS (
        |  SELECT th.threshold,
        |    CAST(sum(CASE WHEN e.s >= th.threshold THEN e.y ELSE 0 END) AS BIGINT) AS tp,
        |    CAST(sum(CASE WHEN e.s >= th.threshold THEN 1 - e.y ELSE 0 END) AS BIGINT) AS fp,
        |    CAST(sum(CASE WHEN e.s < th.threshold THEN e.y ELSE 0 END) AS BIGINT) AS fn,
        |    CAST(sum(CASE WHEN e.s < th.threshold THEN 1 - e.y ELSE 0 END) AS BIGINT) AS tn
        |  FROM e CROSS JOIN th GROUP BY th.threshold)
        |SELECT threshold, tp, fp, fn, tn,
        |  CASE WHEN tp + fp > 0 THEN round(CAST(tp AS DOUBLE) / (tp + fp), 6) END AS "precision",
        |  CASE WHEN tp + fn > 0 THEN round(CAST(tp AS DOUBLE) / (tp + fn), 6) END AS recall,
        |  CASE WHEN 2 * tp + fp + fn > 0 THEN round(2.0 * tp / (2 * tp + fp + fn), 6) END AS f1
        |FROM c ORDER BY threshold""".stripMargin,

    "q_brier" ->
      """WITH e AS (
        |  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
        |    CAST(l_partkey % 997 AS DOUBLE) / 997.0 AS p
        |  FROM lineitem),
        |g AS (SELECT p, y, CAST(count(*) AS BIGINT) AS c FROM e GROUP BY p, y),
        |m AS (SELECT c, round((p - y) * (p - y), 9) AS term FROM g)
        |SELECT CAST(sum(c) AS BIGINT) AS n,
        |  round(CAST(sum(CAST(c AS DECIMAL(10,0)) * CAST(term AS DECIMAL(18,9))) AS DOUBLE) / sum(c), 6) AS brier
        |FROM m""".stripMargin,

    // log-loss replay: same clamp, same distinct-(p,y) reduction, same
    // 9-dp term rounding and decimal count-weighted sum
    "q_logloss" ->
      """WITH e AS (
        |  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
        |    least(greatest(CAST(l_partkey % 997 AS DOUBLE) / 997.0, 1e-15),
        |          1.0 - 1e-15) AS p
        |  FROM lineitem),
        |g AS (SELECT p, y, CAST(count(*) AS BIGINT) AS c FROM e GROUP BY p, y),
        |m AS (
        |  SELECT c,
        |    round(CASE WHEN y = 1 THEN -ln(p) ELSE -ln(1.0 - p) END, 9) AS term
        |  FROM g)
        |SELECT CAST(sum(c) AS BIGINT) AS n,
        |  round(CAST(sum(CAST(CAST(term AS DECIMAL(18,9)) * c AS DECIMAL(38,9))) AS DOUBLE) / sum(c), 6) AS log_loss
        |FROM m""".stripMargin,

    "q_standardize" ->
      """WITH e AS (SELECT event_id, event_type, value FROM events),
        |g AS (
        |  SELECT event_type, count(*) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4)) AS DECIMAL(30,8))) AS DOUBLE) AS sxx
        |  FROM e GROUP BY 1)
        |SELECT e.event_id, e.event_type, e.value,
        |  CASE WHEN g.n > 1 AND (g.n * g.sxx - g.sx * g.sx) > 0 THEN
        |    round((e.value - g.sx / g.n) / sqrt((g.n * g.sxx - g.sx * g.sx) / (g.n * (g.n - 1))), 6)
        |  END AS value_z
        |FROM e JOIN g USING (event_type) ORDER BY event_id""".stripMargin,

    "q_skew_profile" ->
      """WITH c AS (SELECT CAST(l_suppkey AS VARCHAR) AS key, count(*) AS cnt FROM lineitem GROUP BY 1),
        |g AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_rows, count(*) AS n_keys, max(cnt) AS max_cnt FROM c),
        |e AS (
        |  SELECT round(-CAST(sum(CAST(round((CAST(cnt AS DOUBLE) / g.n_rows) * ln(CAST(cnt AS DOUBLE) / g.n_rows), 9) AS DECIMAL(18,9))) AS DOUBLE), 6) AS entropy
        |  FROM c, g),
        |t AS (SELECT key, cnt, CAST(row_number() OVER (ORDER BY cnt DESC, key ASC) AS INTEGER) AS rank FROM c)
        |SELECT rank, key, cnt, round(CAST(cnt AS DOUBLE) / g.n_rows, 6) AS frac,
        |  g.n_rows, g.n_keys, round(CAST(g.max_cnt AS DOUBLE) * g.n_keys / g.n_rows, 6) AS skew,
        |  e.entropy
        |FROM t, g, e WHERE rank <= 5 ORDER BY rank""".stripMargin,

    // PSI replay: base-decile edges via quantile_cont (== Spark exact
    // percentile), same bin comparison sum, 1e-6 empty-bin clamp, same
    // (pc-pb)*ln(pc/pb) op order, decimal total
    "q_psi_drift" ->
      """WITH base AS (SELECT o_totalprice AS v FROM orders WHERE o_orderdate < DATE '1996-01-01'),
        |cur AS (SELECT o_totalprice AS v FROM orders WHERE o_orderdate >= DATE '1996-01-01'),
        |e AS (SELECT quantile_cont(v, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS edges FROM base),
        |bb AS (
        |  SELECT 1 + list_sum(list_transform(e.edges, x -> CASE WHEN v > x THEN 1 ELSE 0 END)) AS bin, count(*) AS n
        |  FROM base, e GROUP BY 1),
        |cc AS (
        |  SELECT 1 + list_sum(list_transform(e.edges, x -> CASE WHEN v > x THEN 1 ELSE 0 END)) AS bin, count(*) AS n
        |  FROM cur, e GROUP BY 1),
        |spine AS (SELECT unnest(range(1, 11)) AS bin),
        |j AS (
        |  SELECT CAST(s.bin AS INTEGER) AS bin, coalesce(bb.n, 0) AS n_base, coalesce(cc.n, 0) AS n_cur
        |  FROM spine s LEFT JOIN bb ON s.bin = bb.bin LEFT JOIN cc ON s.bin = cc.bin),
        |p AS (
        |  SELECT bin, n_base, n_cur,
        |    CASE WHEN n_base = 0 THEN 1e-6
        |         ELSE CAST(n_base AS DOUBLE) / CAST(sum(n_base) OVER () AS DOUBLE) END AS pb,
        |    CASE WHEN n_cur = 0 THEN 1e-6
        |         ELSE CAST(n_cur AS DOUBLE) / CAST(sum(n_cur) OVER () AS DOUBLE) END AS pc
        |  FROM j),
        |c AS (
        |  SELECT bin, n_base, n_cur, round(pb, 6) AS p_base, round(pc, 6) AS p_cur,
        |    round((pc - pb) * ln(pc / pb), 6) AS psi_contrib
        |  FROM p)
        |SELECT bin, n_base, n_cur, p_base, p_cur, psi_contrib,
        |  round(CAST(sum(CAST(psi_contrib AS DECIMAL(18,6))) OVER () AS DOUBLE), 6) AS psi_total
        |FROM c ORDER BY bin""".stripMargin,

    "q_binned_range_join" ->
      """SELECT c_custkey, s_suppkey, c_acctbal
        |FROM customer JOIN supplier
        |  ON c_acctbal >= s_acctbal AND c_acctbal < s_acctbal + 500
        |ORDER BY c_custkey, s_suppkey""".stripMargin,

    "q_hierarchy_levels" ->
      """WITH RECURSIVE e AS (
        |  SELECT CAST(child AS VARCHAR) AS child, CAST(parent AS VARCHAR) AS parent
        |  FROM (SELECT c_custkey AS child, c_custkey // 10 AS parent
        |        FROM customer WHERE c_custkey >= 10)),
        |nodes AS (SELECT child AS node FROM e UNION SELECT parent FROM e),
        |roots AS (SELECT node FROM nodes WHERE node NOT IN (SELECT child FROM e)),
        |lv(node, lvl) AS (
        |  SELECT node, 0 FROM roots
        |  UNION ALL
        |  SELECT e.child, lv.lvl + 1 FROM e JOIN lv ON e.parent = lv.node
        |  WHERE lv.lvl < 6)
        |SELECT node, CAST(min(lvl) AS INTEGER) AS level
        |FROM lv GROUP BY node ORDER BY node""".stripMargin,

    "q_window_suite" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(rank() OVER w AS INTEGER) AS rnk,
        |  CAST(dense_rank() OVER w AS INTEGER) AS drnk,
        |  round(percent_rank() OVER w, 6) AS prnk,
        |  round(cume_dist() OVER w, 6) AS cd,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |  lag(o_orderkey, 1) OVER w AS prev_ok,
        |  lead(o_orderkey, 1) OVER w AS next_ok
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
        |ORDER BY o_custkey, rnk""".stripMargin,

    "q_expectations" ->
      """WITH rowrules AS (
        |  SELECT * FROM (VALUES
        |    ('custkey_not_null', (SELECT count(*) FROM orders WHERE o_custkey IS NULL)),
        |    ('price_range', (SELECT count(*) FROM orders WHERE NOT (o_totalprice >= 0.0 AND o_totalprice <= 1e6) OR o_totalprice IS NULL)),
        |    ('status_domain', (SELECT count(*) FROM orders WHERE NOT coalesce(o_orderstatus IN ('F','O','P'), false))),
        |    ('priority_shape', (SELECT count(*) FROM orders WHERE NOT coalesce(regexp_matches(o_orderpriority, '^[1-5]-[A-Z]+$'), false))),
        |    ('dates_sane', (SELECT count(*) FROM orders WHERE NOT coalesce(o_orderdate >= DATE '1992-01-01' AND o_orderdate < DATE '1999-01-01', false))),
        |    ('orderkey_unique', (SELECT coalesce(sum(c - 1), 0) FROM (SELECT count(*) AS c FROM orders GROUP BY o_orderkey HAVING count(*) > 1)))
        |  ) AS t(rule, violations))
        |SELECT rule, CAST(violations AS BIGINT) AS violations, violations = 0 AS passed
        |FROM rowrules ORDER BY rule""".stripMargin,

    "q_skew_join" ->
      """SELECT l_orderkey, l_linenumber, l_suppkey, l_quantity, s_name
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |ORDER BY l_orderkey, l_linenumber, l_suppkey, l_quantity, s_name""".stripMargin,

    "q_assoc_rules" ->
      """WITH it AS (SELECT DISTINCT l_orderkey AS b, l_suppkey AS i FROM lineitem),
        |sized AS (SELECT b FROM it GROUP BY b HAVING count(*) <= 1000),
        |inb AS (SELECT it.b, it.i FROM it JOIN sized ON it.b = sized.b),
        |nb AS (SELECT count(*) AS n_baskets FROM sized),
        |ci AS (SELECT i, count(*) AS ci FROM inb GROUP BY i),
        |pr AS (
        |  SELECT a.i AS ia, c.i AS ib, count(*) AS cab
        |  FROM inb a JOIN inb c ON a.b = c.b AND a.i < c.i
        |  GROUP BY a.i, c.i HAVING count(*) >= 3),
        |pl AS (
        |  SELECT pr.ia, pr.ib, pr.cab, ca.ci AS ca, cb.ci AS cb,
        |    round(CAST(pr.cab AS DOUBLE) * nb.n_baskets / (CAST(ca.ci AS DOUBLE) * cb.ci), 6) AS lift
        |  FROM pr JOIN ci ca ON pr.ia = ca.i JOIN ci cb ON pr.ib = cb.i, nb),
        |dir AS (
        |  SELECT ia AS antecedent, ib AS consequent, cab, ca AS c_ante, lift FROM pl
        |  UNION ALL
        |  SELECT ib, ia, cab, cb, lift FROM pl)
        |SELECT antecedent, consequent, cab, c_ante,
        |  round(CAST(cab AS DOUBLE) / c_ante, 6) AS confidence, lift
        |FROM dir
        |ORDER BY confidence DESC, cab DESC, antecedent ASC, consequent ASC
        |LIMIT 20""".stripMargin,

    "q_coocurrence" ->
      """WITH it AS (SELECT DISTINCT l_orderkey AS b, l_suppkey AS i FROM lineitem),
        |sized AS (SELECT b FROM it GROUP BY b HAVING count(*) <= 1000),
        |inb AS (SELECT it.b, it.i FROM it JOIN sized ON it.b = sized.b),
        |nb AS (SELECT count(*) AS n_baskets FROM sized),
        |ci AS (SELECT i, count(*) AS ci FROM inb GROUP BY i),
        |pr AS (
        |  SELECT a.i AS ia, c.i AS ib, count(*) AS cab
        |  FROM inb a JOIN inb c ON a.b = c.b AND a.i < c.i
        |  GROUP BY a.i, c.i)
        |SELECT pr.ia, pr.ib, pr.cab, ca.ci AS ca, cb.ci AS cb,
        |  round(CAST(pr.cab AS DOUBLE) * nb.n_baskets / (CAST(ca.ci AS DOUBLE) * cb.ci), 6) AS lift
        |FROM pr JOIN ci ca ON pr.ia = ca.i JOIN ci cb ON pr.ib = cb.i, nb
        |ORDER BY cab DESC, lift DESC, ia ASC, ib ASC LIMIT 20""".stripMargin,

    "q_interval_overlap_join" ->
      """WITH f AS (
        |  SELECT o_custkey, o_orderkey AS f_order,
        |    CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS DOUBLE) AS lo
        |  FROM orders WHERE o_orderstatus = 'F'),
        |o AS (
        |  SELECT o_custkey, o_orderkey AS o_order,
        |    CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS DOUBLE) AS lo
        |  FROM orders WHERE o_orderstatus = 'O')
        |SELECT f.o_custkey, f.f_order, o.o_order
        |FROM f JOIN o ON f.o_custkey = o.o_custkey
        |  AND f.lo < o.lo + 14.0 AND o.lo < f.lo + 14.0
        |ORDER BY f.o_custkey, f.f_order, o.o_order""".stripMargin,

    "q_tpch1" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(round(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(30,4))), 2) AS DOUBLE) AS sum_disc_price,
        |  CAST(round(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2))) AS DECIMAL(30,6))), 2) AS DOUBLE) AS sum_charge,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_price,
        |  round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_tpch3" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(30,4))) AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < DATE '1995-03-15' AND l_shipdate > DATE '1995-03-15'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC LIMIT 10""".stripMargin,

    "q_tpch6" ->
      """SELECT
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(30,4))) AS DOUBLE) AS revenue,
        |  CAST(count(*) AS BIGINT) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
        |  AND CAST(l_discount AS DECIMAL(18,2)) BETWEEN CAST(0.05 AS DECIMAL(18,2)) AND CAST(0.07 AS DECIMAL(18,2))
        |  AND l_quantity < 24""".stripMargin,

    "q_tpch10" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(30,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= DATE '1996-10-01' AND o_orderdate < DATE '1997-01-01'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey ASC LIMIT 20""".stripMargin,

    // sum of DECIMAL(30,4) revenue is ~8 integer digits at gate scale
    // (≤ 12 significant digits with the 4-dp scale) — exact in double,
    // no rounding needed on either side
    "q_tpch5" ->
      """SELECT n_name,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(30,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name ASC""".stripMargin,

    "q_tpch19" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(30,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 35)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)""".stripMargin,

    "q_tpch14" ->
      """SELECT round(100.0 *
        |    CAST(sum(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(30,4))
        |      ELSE CAST(0 AS DECIMAL(30,4)) END) AS DOUBLE) /
        |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(30,4))) AS DOUBLE),
        |  6) AS promo_revenue_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= DATE '1996-03-01' AND l_shipdate < DATE '1996-04-01'""".stripMargin,

    "q_tpch15" ->
      """WITH revenue AS (
        |  SELECT l_suppkey,
        |    sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(30,4))) AS tr
        |  FROM lineitem
        |  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(tr AS DOUBLE) AS total_revenue
        |FROM revenue JOIN supplier ON l_suppkey = s_suppkey
        |WHERE tr = (SELECT max(tr) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,

    "q_tpch18" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        |  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 300)
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
        |LIMIT 100""".stripMargin,

    "q_tpch7" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(extract(year FROM l_shipdate) AS INTEGER) AS l_year,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(30,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1997-01-01'
        |GROUP BY n1.n_name, n2.n_name, CAST(extract(year FROM l_shipdate) AS INTEGER)
        |ORDER BY revenue DESC, supp_nation ASC, cust_nation ASC, l_year ASC
        |LIMIT 20""".stripMargin,

    "q_tpch8" ->
      """SELECT CAST(extract(year FROM o_orderdate) AS INTEGER) AS o_year,
        |  round(
        |    CAST(sum(CASE WHEN n2.n_name = 'NATION_3'
        |      THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(30,4))
        |      ELSE CAST(0 AS DECIMAL(30,4)) END) AS DOUBLE) /
        |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(30,4))) AS DOUBLE),
        |  6) AS mkt_share,
        |  CAST(count(*) AS BIGINT) AS n_lines
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN region ON n1.n_regionkey = r_regionkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE p_type = 'ECONOMY' AND r_name = 'AMERICA'
        |  AND o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1997-01-01'
        |GROUP BY CAST(extract(year FROM o_orderdate) AS INTEGER)
        |ORDER BY o_year ASC""".stripMargin,

    "q_tpch13" ->
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q_tpch17" ->
      """SELECT
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
        |  CAST(count(*) AS BIGINT) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |JOIN (SELECT l_partkey AS pk, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq,
        |        count(*) AS nq
        |      FROM lineitem GROUP BY l_partkey) ON pk = l_partkey
        |WHERE p_brand = 'Brand#1'
        |  AND CAST(l_quantity AS DECIMAL(18,2)) * 5 * nq < sq""".stripMargin,

    "q_tpch22" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS numcust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM customer
        |JOIN (SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS tot, count(*) AS npos
        |      FROM customer WHERE c_acctbal > 0)
        |  ON CAST(c_acctbal AS DECIMAL(18,2)) * npos > tot
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderdate >= DATE '2000-01-01')
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment ASC""".stripMargin,

    "q_unpivot" ->
      """SELECT * FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem)
        |ORDER BY l_orderkey, l_linenumber, metric, value""".stripMargin,

    // pagerank: 3 unrolled synchronous steps, decimal-accumulated edge
    // contributions, IEEE-replayed scalar update (note (CAST(1 AS
    // DOUBLE) - 0.85), the same runtime subtraction the engine does —
    // NOT a pre-simplified 0.15, which is a different double)
    "q_pagerank" ->
      // e/nodes/od are MATERIALIZED: DuckDB inlines plain CTEs, so the
      // 6M-row join+distinct would otherwise re-evaluate once per
      // reference (~6x) — at the 10x dataset the concurrent copies
      // exhausted the spill disk; materialized once they fit easily
      """WITH e AS MATERIALIZED (
        |  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |nn AS (SELECT count(*) AS n FROM nodes),
        |od AS MATERIALIZED (SELECT src, count(*) AS od FROM e GROUP BY src),
        |r0 AS (SELECT node, CAST(1 AS DOUBLE) / nn.n AS rank FROM nodes, nn),
        |c1 AS (SELECT e.dst AS node, sum(CAST(round(r.rank / od.od, 12) AS DECIMAL(24,12))) AS csum
        |       FROM e JOIN r0 r ON e.src = r.node JOIN od ON e.src = od.src GROUP BY e.dst),
        |d1 AS (SELECT coalesce(sum(CAST(round(rank, 12) AS DECIMAL(24,12))), 0) AS dsum
        |       FROM r0 WHERE node NOT IN (SELECT src FROM od)),
        |r1 AS (SELECT nodes.node,
        |         round((CAST(1 AS DOUBLE) - 0.85) / nn.n + 0.85 *
        |           (coalesce(CAST(c1.csum AS DOUBLE), 0) + CAST(d1.dsum AS DOUBLE) / nn.n), 12) AS rank
        |       FROM nodes LEFT JOIN c1 ON nodes.node = c1.node, nn, d1),
        |c2 AS (SELECT e.dst AS node, sum(CAST(round(r.rank / od.od, 12) AS DECIMAL(24,12))) AS csum
        |       FROM e JOIN r1 r ON e.src = r.node JOIN od ON e.src = od.src GROUP BY e.dst),
        |d2 AS (SELECT coalesce(sum(CAST(round(rank, 12) AS DECIMAL(24,12))), 0) AS dsum
        |       FROM r1 WHERE node NOT IN (SELECT src FROM od)),
        |r2 AS (SELECT nodes.node,
        |         round((CAST(1 AS DOUBLE) - 0.85) / nn.n + 0.85 *
        |           (coalesce(CAST(c2.csum AS DOUBLE), 0) + CAST(d2.dsum AS DOUBLE) / nn.n), 12) AS rank
        |       FROM nodes LEFT JOIN c2 ON nodes.node = c2.node, nn, d2),
        |c3 AS (SELECT e.dst AS node, sum(CAST(round(r.rank / od.od, 12) AS DECIMAL(24,12))) AS csum
        |       FROM e JOIN r2 r ON e.src = r.node JOIN od ON e.src = od.src GROUP BY e.dst),
        |d3 AS (SELECT coalesce(sum(CAST(round(rank, 12) AS DECIMAL(24,12))), 0) AS dsum
        |       FROM r2 WHERE node NOT IN (SELECT src FROM od)),
        |r3 AS (SELECT nodes.node,
        |         round((CAST(1 AS DOUBLE) - 0.85) / nn.n + 0.85 *
        |           (coalesce(CAST(c3.csum AS DOUBLE), 0) + CAST(d3.dsum AS DOUBLE) / nn.n), 12) AS rank
        |       FROM nodes LEFT JOIN c3 ON nodes.node = c3.node, nn, d3)
        |SELECT node, rank FROM r3 ORDER BY node""".stripMargin,

    "q_resample" ->
      """WITH e AS (
        |  SELECT event_type, (epoch_ns(ts) // 1000000000) // 3600 * 3600 AS slot, value FROM events),
        |obs AS (
        |  SELECT event_type, slot, sum(CAST(value AS DECIMAL(18,2))) AS vs, count(*) AS n
        |  FROM e GROUP BY 1, 2),
        |b AS (SELECT event_type, min(slot) AS lo, max(slot) AS hi FROM obs GROUP BY 1),
        |spine AS (SELECT event_type, unnest(range(lo, hi + 3600, 3600)) AS slot FROM b)
        |SELECT s.event_type, s.slot,
        |  CAST((CASE WHEN o.vs < 0 THEN -1 ELSE 1 END) * ((abs(CAST(o.vs * 100 AS BIGINT)) * 20000 + o.n) // (2 * o.n)) AS DOUBLE) / 1e6 AS value_avg,
        |  coalesce(o.n, 0) AS n
        |FROM spine s LEFT JOIN obs o ON s.event_type = o.event_type AND s.slot = o.slot
        |ORDER BY s.event_type, s.slot""".stripMargin,

    "q_ts_anomaly" ->
      """WITH e AS (
        |  SELECT event_type, (epoch_ns(ts) // 1000000000) // 3600 * 3600 AS slot, value FROM events),
        |obs AS (
        |  SELECT event_type, slot, sum(CAST(value AS DECIMAL(18,2))) AS vs, count(*) AS n
        |  FROM e GROUP BY 1, 2),
        |b AS (SELECT event_type, min(slot) AS lo, max(slot) AS hi FROM obs GROUP BY 1),
        |spine AS (SELECT event_type, unnest(range(lo, hi + 3600, 3600)) AS slot FROM b),
        |rs AS (
        |  SELECT s.event_type, s.slot, CAST((CASE WHEN o.vs < 0 THEN -1 ELSE 1 END) * ((abs(CAST(o.vs * 100 AS BIGINT)) * 20000 + o.n) // (2 * o.n)) AS DOUBLE) / 1e6 AS v
        |  FROM spine s LEFT JOIN obs o ON s.event_type = o.event_type AND s.slot = o.slot),
        |m AS (
        |  SELECT event_type, slot, v,
        |    count(v) OVER win AS n,
        |    CAST(sum(CAST(v AS DECIMAL(18,4))) OVER win AS DOUBLE) AS sx,
        |    CAST(sum(CAST(CAST(v AS DECIMAL(18,4)) * CAST(v AS DECIMAL(18,4)) AS DECIMAL(30,8))) OVER win AS DOUBLE) AS sxx
        |  FROM rs
        |  WINDOW win AS (PARTITION BY event_type ORDER BY slot ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
        |zc AS (
        |  SELECT event_type, slot, v,
        |    CASE WHEN v IS NOT NULL AND n > 1 AND (n * sxx - sx * sx) > 0 THEN
        |      round((v - sx / n) / sqrt((n * sxx - sx * sx) / (n * (n - 1))), 6)
        |    END AS z
        |  FROM m)
        |SELECT event_type, slot, v AS value_avg, z,
        |  coalesce(abs(z) > 3.0, false) AS is_anomaly
        |FROM zc ORDER BY event_type, slot""".stripMargin,

    "q_interpolate" ->
      """WITH e AS (
        |  SELECT event_type, (epoch_ns(ts) // 1000000000) // 3600 * 3600 AS slot, value FROM events),
        |obs AS (
        |  SELECT event_type, slot, sum(CAST(value AS DECIMAL(18,2))) AS vs, count(*) AS n
        |  FROM e GROUP BY 1, 2),
        |b AS (SELECT event_type, min(slot) AS lo, max(slot) AS hi FROM obs GROUP BY 1),
        |spine AS (SELECT event_type, unnest(range(lo, hi + 3600, 3600)) AS slot FROM b),
        |rs AS (
        |  SELECT s.event_type, s.slot, CAST((CASE WHEN o.vs < 0 THEN -1 ELSE 1 END) * ((abs(CAST(o.vs * 100 AS BIGINT)) * 20000 + o.n) // (2 * o.n)) AS DOUBLE) / 1e6 AS v
        |  FROM spine s LEFT JOIN obs o ON s.event_type = o.event_type AND s.slot = o.slot),
        |nb AS (
        |  SELECT event_type, slot, v,
        |    last_value(v IGNORE NULLS) OVER
        |      (PARTITION BY event_type ORDER BY slot ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
        |    last_value(CASE WHEN v IS NOT NULL THEN CAST(slot AS DOUBLE) END IGNORE NULLS) OVER
        |      (PARTITION BY event_type ORDER BY slot ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pt,
        |    first_value(v IGNORE NULLS) OVER
        |      (PARTITION BY event_type ORDER BY slot ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
        |    first_value(CASE WHEN v IS NOT NULL THEN CAST(slot AS DOUBLE) END IGNORE NULLS) OVER
        |      (PARTITION BY event_type ORDER BY slot ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nt
        |  FROM rs),
        |interp AS (
        |  SELECT event_type, slot,
        |    CASE WHEN v IS NOT NULL THEN v
        |         WHEN pv IS NOT NULL AND nv IS NOT NULL AND nt <> pt THEN
        |           round(pv + (nv - pv) * (CAST(slot AS DOUBLE) - pt) / (nt - pt), 6)
        |    END AS value_interp
        |  FROM nb)
        |SELECT event_type, slot, value_interp,
        |  last_value(value_interp IGNORE NULLS) OVER
        |    (PARTITION BY event_type ORDER BY slot ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled
        |FROM interp ORDER BY event_type, slot""".stripMargin,

    "q_asof_join" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, CAST(date_trunc('second', ts) AS TIMESTAMP) AS tss, value FROM events),
        |r AS (
        |  SELECT user_id, tss AS rts, max(value) AS ref_value
        |  FROM ev WHERE event_id % 10 = 0 GROUP BY user_id, tss)
        |SELECT e.event_id, e.user_id, e.tss, r.ref_value
        |FROM ev e ASOF LEFT JOIN r ON e.user_id = r.user_id AND e.tss >= r.rts
        |ORDER BY e.event_id""".stripMargin,

    "q_asof_tolerance" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, CAST(date_trunc('second', ts) AS TIMESTAMP) AS tss, value FROM events),
        |r AS (
        |  SELECT user_id, tss AS rts, max(value) AS ref_value
        |  FROM ev WHERE event_id % 10 = 0 GROUP BY user_id, tss)
        |SELECT e.event_id, e.user_id, e.tss,
        |  CASE WHEN r.rts >= e.tss - INTERVAL 10 MINUTE THEN r.ref_value END AS ref_value_fresh
        |FROM ev e ASOF LEFT JOIN r ON e.user_id = r.user_id AND e.tss >= r.rts
        |ORDER BY e.event_id""".stripMargin,

    "q_asof_forward" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, CAST(date_trunc('second', ts) AS TIMESTAMP) AS tss, value FROM events),
        |r AS (
        |  SELECT user_id, tss AS rts, max(value) AS ref_value
        |  FROM ev WHERE event_id % 10 = 0 GROUP BY user_id, tss)
        |SELECT e.event_id, e.user_id, e.tss, r.ref_value
        |FROM ev e ASOF LEFT JOIN r ON e.user_id = r.user_id AND e.tss <= r.rts
        |ORDER BY e.event_id""".stripMargin,

    "q_asof_native" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, CAST(date_trunc('second', ts) AS TIMESTAMP) AS tss, value FROM events),
        |r AS (
        |  SELECT user_id, tss AS rts, max(value) AS ref_value
        |  FROM ev WHERE event_id % 10 = 0 GROUP BY user_id, tss)
        |SELECT e.event_id, e.user_id, e.tss, r.ref_value
        |FROM ev e ASOF LEFT JOIN r ON e.user_id = r.user_id AND e.tss >= r.rts
        |ORDER BY e.event_id""".stripMargin,

    "q_asof_native_fwd" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, CAST(date_trunc('second', ts) AS TIMESTAMP) AS tss, value FROM events),
        |r AS (
        |  SELECT user_id, tss AS rts, max(value) AS ref_value
        |  FROM ev WHERE event_id % 10 = 0 GROUP BY user_id, tss)
        |SELECT e.event_id, e.user_id, e.tss, r.ref_value
        |FROM ev e ASOF LEFT JOIN r ON e.user_id = r.user_id AND e.tss <= r.rts
        |ORDER BY e.event_id""".stripMargin,

    "q_fk_orphans" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber FROM lineitem
        |  UNION ALL SELECT CAST(-999 AS BIGINT), 1)
        |SELECT l_orderkey, l_linenumber FROM li
        |WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_percentiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS median_qty,
        |  quantile_cont(l_quantity, 0.9) AS p90_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_range_join" ->
      """WITH bands(band, lo, hi) AS (
        |  VALUES ('small', 0.0, 100000.0), ('medium', 100000.0, 250000.0), ('large', 250000.0, 1e9))
        |SELECT o_orderkey, o_totalprice, band FROM orders
        |JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
        |ORDER BY o_orderkey""".stripMargin,

    "q_share_of_total" ->
      """WITH seg AS (
        |  SELECT c_mktsegment, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_d, count(*) AS n_orders
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY c_mktsegment)
        |SELECT c_mktsegment, CAST(rev_d AS DOUBLE) AS revenue, n_orders,
        |  round(CAST(rev_d AS DOUBLE) / CAST(sum(rev_d) OVER () AS DOUBLE), 6) AS share
        |FROM seg ORDER BY c_mktsegment""".stripMargin,

    "q_agent_dashboard" ->
      """WITH per_supp AS (
        |  SELECT s_suppkey, s_name, n_name, count(*) AS n_items,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  GROUP BY s_suppkey, s_name, n_name)
        |SELECT s_suppkey, s_name, n_name, n_items, revenue, avg_qty,
        |  CAST(row_number() OVER (PARTITION BY n_name ORDER BY revenue DESC, s_suppkey ASC) AS INTEGER) AS rank_in_nation
        |FROM per_supp ORDER BY n_name, rank_in_nation""".stripMargin,

    "q_pivot" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS "F",
        |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS "O",
        |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS "P"
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    // same fixed IEEE bucket expression as the engine
    "q_histogram" ->
      """WITH b AS (
        |  SELECT CASE WHEN l_extendedprice < 900.0 THEN 0
        |              WHEN l_extendedprice >= 105000.0 THEN 21
        |              ELSE CAST(floor(20.0 * (l_extendedprice - 900.0) / (105000.0 - 900.0)) AS BIGINT) + 1
        |         END AS bucket,
        |         l_extendedprice
        |  FROM lineitem)
        |SELECT bucket, count(*) AS n,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,

    // decimal-exact moments → the identical double z expression
    "q_outliers" ->
      """WITH m AS (
        |  SELECT event_type, count(*) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS s1,
        |    CAST(sum(CAST(value * value AS DECIMAL(28,10))) AS DOUBLE) AS s2
        |  FROM events GROUP BY event_type)
        |SELECT e.event_id, e.event_type, e.value
        |FROM events e JOIN m ON e.event_type = m.event_type
        |WHERE m.n > 1
        |  AND (s2 - s1 * s1 / n) / (n - 1.0) > 0
        |  AND abs((e.value - s1 / n) / sqrt((s2 - s1 * s1 / n) / (n - 1.0))) > 2.0
        |ORDER BY e.event_id""".stripMargin,

    // strict-order funnel replay: chained min-after-previous-step
    "q_funnel_windowed" ->
      """WITH e AS (
        |  SELECT user_id, event_type,
        |    make_timestamp(epoch_ns(ts) // 1000) AS ts
        |  FROM events),
        |t0 AS (
        |  SELECT user_id, min(ts) AS t0 FROM e
        |  WHERE event_type = 'view' GROUP BY user_id),
        |t1 AS (
        |  SELECT t0.user_id, t0.t0,
        |    min(CASE WHEN e.ts > t0.t0 AND e.ts <= t0.t0 + INTERVAL 3600 SECOND
        |      THEN e.ts END) AS t1
        |  FROM t0 LEFT JOIN e
        |    ON e.user_id = t0.user_id AND e.event_type = 'click'
        |  GROUP BY t0.user_id, t0.t0),
        |t2 AS (
        |  SELECT t1.user_id, t1.t0, t1.t1,
        |    min(CASE WHEN e.ts > t1.t1 AND e.ts <= t1.t1 + INTERVAL 3600 SECOND
        |      THEN e.ts END) AS t2
        |  FROM t1 LEFT JOIN e
        |    ON e.user_id = t1.user_id AND e.event_type = 'purchase'
        |  GROUP BY t1.user_id, t1.t0, t1.t1),
        |c AS (SELECT count(t0) AS c0, count(t1) AS c1, count(t2) AS c2 FROM t2)
        |SELECT * FROM (
        |  SELECT 'view' AS step, 0 AS step_idx, c0 AS users,
        |    CAST(1.0 AS DOUBLE) AS conversion FROM c
        |  UNION ALL SELECT 'click', 1, c1, round(CAST(c1 AS DOUBLE) / c0, 6) FROM c
        |  UNION ALL SELECT 'purchase', 2, c2, round(CAST(c2 AS DOUBLE) / c0, 6) FROM c)
        |ORDER BY step_idx""".stripMargin,

    "q_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type,
        |    make_timestamp(epoch_ns(ts) // 1000) AS ts
        |  FROM events),
        |t0 AS (
        |  SELECT user_id, min(ts) AS t0 FROM e
        |  WHERE event_type = 'view' GROUP BY user_id),
        |t1 AS (
        |  SELECT t0.user_id, t0.t0,
        |    min(CASE WHEN e.ts > t0.t0 THEN e.ts END) AS t1
        |  FROM t0 LEFT JOIN e
        |    ON e.user_id = t0.user_id AND e.event_type = 'click'
        |  GROUP BY t0.user_id, t0.t0),
        |t2 AS (
        |  SELECT t1.user_id, t1.t0, t1.t1,
        |    min(CASE WHEN e.ts > t1.t1 THEN e.ts END) AS t2
        |  FROM t1 LEFT JOIN e
        |    ON e.user_id = t1.user_id AND e.event_type = 'purchase'
        |  GROUP BY t1.user_id, t1.t0, t1.t1),
        |c AS (SELECT count(t0) AS c0, count(t1) AS c1, count(t2) AS c2 FROM t2)
        |SELECT * FROM (
        |  SELECT 'view' AS step, 0 AS step_idx, c0 AS users,
        |    CAST(1.0 AS DOUBLE) AS conversion FROM c
        |  UNION ALL SELECT 'click', 1, c1, round(CAST(c1 AS DOUBLE) / c0, 6) FROM c
        |  UNION ALL SELECT 'purchase', 2, c2, round(CAST(c2 AS DOUBLE) / c0, 6) FROM c)
        |ORDER BY step_idx""".stripMargin,

    // cohort = first active day; cell counts distinct active days' users
    "q_retention" ->
      """WITH e AS (
        |  SELECT DISTINCT user_id AS u,
        |    CAST(make_timestamp(epoch_ns(ts) // 1000) AS DATE) AS day
        |  FROM events),
        |c AS (SELECT u, min(day) AS cohort_day FROM e GROUP BY u)
        |SELECT c.cohort_day,
        |  CAST(datediff('day', c.cohort_day, e.day) AS INTEGER) AS day_offset,
        |  count(*) AS active_users
        |FROM e JOIN c ON e.u = c.u
        |WHERE datediff('day', c.cohort_day, e.day) <= 30
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_transitions" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |    make_timestamp(epoch_ns(ts) // 1000) AS ts FROM events),
        |p AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |  FROM e)
        |SELECT from_type, to_type, count(*) AS n,
        |  round(CAST(count(*) AS DOUBLE) / sum(count(*)) OVER (PARTITION BY from_type), 6) AS p
        |FROM p WHERE to_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // BH replay: FNV p-values, exact cross-multiplied acceptance,
    // rank window over the 20-hypothesis frame, closure via max rank
    "x_fdr" ->
      s"""WITH src AS (SELECT DISTINCT source FROM documents),
         |h AS (
         |  SELECT source,
         |    ${fnvSql("(coalesce(CAST(source AS VARCHAR), chr(0) || 'null') || ':7')")} AS hu
         |  FROM src),
         |b AS (
         |  SELECT source,
         |    ((${signedSql("hu")} % 1000000) + 1000000) % 1000000 AS bk
         |  FROM h),
         |p AS (
         |  SELECT source AS id,
         |    CAST(CASE WHEN bk % 2 = 0 THEN CAST(bk % 10000 AS DOUBLE) / 1000000.0
         |              ELSE CAST(bk AS DOUBLE) / 1000000.0 END AS DECIMAL(18,6)) AS p
         |  FROM b),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS mm FROM p),
         |r AS (
         |  SELECT id, p, CAST(row_number() OVER (ORDER BY p, id) AS INTEGER) AS rank, mm
         |  FROM p CROSS JOIN m),
         |q AS (SELECT id, p, rank, p * mm * 5 <= rank * 1 AS qualifies FROM r),
         |k AS (SELECT coalesce(max(CASE WHEN qualifies THEN rank END), 0) AS kmax FROM q)
         |SELECT id, CAST(p AS DOUBLE) AS p, rank, qualifies, rank <= kmax AS significant
         |FROM q CROSS JOIN k ORDER BY rank""".stripMargin,

    // SRM replay: exact-rational expected counts, 9-dp decimal term
    // sums, the same fixed chi2 shape and flag
    "x_srm" ->
      """WITH o AS (
        |  SELECT CAST(user_id % 2 AS VARCHAR) AS "group",
        |    CAST(count(*) AS BIGINT) AS n_obs
        |  FROM events GROUP BY 1),
        |n AS (SELECT CAST(sum(n_obs) AS BIGINT) AS N FROM o),
        |t AS (
        |  SELECT "group", n_obs,
        |    CAST(N AS DOUBLE) * 1 / 2 AS n_exp,
        |    round((CAST(n_obs AS DOUBLE) - CAST(N AS DOUBLE) * 1 / 2) *
        |          (CAST(n_obs AS DOUBLE) - CAST(N AS DOUBLE) * 1 / 2) /
        |          (CAST(N AS DOUBLE) * 1 / 2), 9) AS term
        |  FROM o CROSS JOIN n),
        |s AS (
        |  SELECT round(CAST(sum(CAST(term AS DECIMAL(28,9))) AS DOUBLE), 6) AS stat,
        |    CAST(count(*) - 1 AS BIGINT) AS dof
        |  FROM t)
        |SELECT "group", n_obs, round(n_exp, 6) AS n_exp, round(term, 6) AS term,
        |  stat, dof, stat > 3.841 AS srm_flag
        |FROM t CROSS JOIN s ORDER BY "group"""".stripMargin,

    // CUPED replay: same per-user pre/post counts, HUGEINT moments,
    // fixed-shape theta / adjusted-mean / rho^2 arithmetic
    "x_cuped" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    CAST(count(*) FILTER (WHERE ts < TIMESTAMP '2024-01-16') AS BIGINT) AS x,
        |    CAST(count(*) FILTER (WHERE ts >= TIMESTAMP '2024-01-16') AS BIGINT) AS y
        |  FROM events GROUP BY user_id),
        |a AS (
        |  SELECT CASE WHEN user_id % 2 = 0 THEN 'ctrl' ELSE 'treat' END AS variant, x, y
        |  FROM pu),
        |m AS (
        |  SELECT CAST(count(*) AS HUGEINT) AS n,
        |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx,
        |    sum(CAST(y AS HUGEINT) * y) AS syy
        |  FROM a),
        |t AS (
        |  SELECT n AS gn, sx AS gsx,
        |    COALESCE(CASE WHEN n * sxx - sx * sx > 0
        |         THEN CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) END,
        |      CAST(0 AS DOUBLE)) AS theta,
        |    CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
        |         THEN round(100.0 * CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE) /
        |              (CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)), 6) END AS var_reduction_pct
        |  FROM m),
        |arm AS (
        |  SELECT variant, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(x AS HUGEINT)) AS ax, sum(CAST(y AS HUGEINT)) AS ay
        |  FROM a GROUP BY variant)
        |SELECT variant, n,
        |  round(CAST(ay AS DOUBLE) / n, 6) AS mean_y,
        |  round(CAST(ay AS DOUBLE) / n -
        |    theta * (CAST(ax AS DOUBLE) / n - CAST(gsx AS DOUBLE) / CAST(gn AS DOUBLE)), 6) AS mean_adj,
        |  round(theta, 6) AS theta, var_reduction_pct
        |FROM arm CROSS JOIN t ORDER BY variant""".stripMargin,

    // DiD replay: 6-dp decimal value mass per (treated, post) cell,
    // four fixed-shape mean divisions, one composed estimate
    "x_did" ->
      """WITH b AS (
        |  SELECT user_id % 2 = 1 AS tr, ts >= TIMESTAMP '2024-01-16' AS po,
        |    CAST(round(CAST(CAST(value AS VARCHAR) AS DECIMAL(38,30)), 6) AS DECIMAL(18,6)) AS v
        |  FROM events),
        |g AS (
        |  SELECT
        |    CAST(count(*) FILTER (WHERE NOT tr AND NOT po) AS BIGINT) AS n_c_pre,
        |    sum(v) FILTER (WHERE NOT tr AND NOT po) AS s_c_pre,
        |    CAST(count(*) FILTER (WHERE NOT tr AND po) AS BIGINT) AS n_c_post,
        |    sum(v) FILTER (WHERE NOT tr AND po) AS s_c_post,
        |    CAST(count(*) FILTER (WHERE tr AND NOT po) AS BIGINT) AS n_t_pre,
        |    sum(v) FILTER (WHERE tr AND NOT po) AS s_t_pre,
        |    CAST(count(*) FILTER (WHERE tr AND po) AS BIGINT) AS n_t_post,
        |    sum(v) FILTER (WHERE tr AND po) AS s_t_post
        |  FROM b)
        |SELECT n_c_pre, n_c_post, n_t_pre, n_t_post,
        |  round(CAST(s_c_pre AS DOUBLE) / n_c_pre, 6) AS mean_c_pre,
        |  round(CAST(s_c_post AS DOUBLE) / n_c_post, 6) AS mean_c_post,
        |  round(CAST(s_t_pre AS DOUBLE) / n_t_pre, 6) AS mean_t_pre,
        |  round(CAST(s_t_post AS DOUBLE) / n_t_post, 6) AS mean_t_post,
        |  round((CAST(s_t_post AS DOUBLE) / n_t_post - CAST(s_t_pre AS DOUBLE) / n_t_pre) -
        |        (CAST(s_c_post AS DOUBLE) / n_c_post - CAST(s_c_pre AS DOUBLE) / n_c_pre), 6) AS did
        |FROM g""".stripMargin,

    // Nelson-Aalen replay: same at-risk frame as KM, 9-dp increment
    // terms, DECIMAL cumulative sum, 6-dp presentation
    "x_hazard" ->
      """WITH b AS (
        |  SELECT o_orderkey % 53 AS t, o_orderstatus = 'F' AS e FROM orders),
        |g AS (
        |  SELECT t, CAST(count(*) FILTER (WHERE e) AS BIGINT) AS n_event,
        |    CAST(count(*) FILTER (WHERE NOT e) AS BIGINT) AS n_censored
        |  FROM b GROUP BY t),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS N FROM b),
        |r AS (
        |  SELECT t, n_event, n_censored,
        |    CAST(N - coalesce(sum(n_event + n_censored) OVER
        |      (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
        |  FROM g CROSS JOIN n),
        |f AS (
        |  SELECT t, n_risk, n_event, n_censored,
        |    CAST(round(CAST(n_event AS DOUBLE) / n_risk, 9) AS DECIMAL(28,9)) AS h
        |  FROM r)
        |SELECT t, n_risk, n_event, n_censored,
        |  round(CAST(sum(h) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS DOUBLE), 6) AS hazard
        |FROM f ORDER BY t""".stripMargin,

    // OHLC replay: same micro-epoch buckets; open/close via
    // (es, v)-ordered row_number — the window equivalent of the
    // engine's min_by/max_by struct ordering
    "x_ohlc" ->
      """WITH e AS (
        |  SELECT event_type AS key, epoch_us(ts) AS es, value AS v FROM events),
        |b AS (
        |  SELECT key, es // 3600000000 * 3600000000 AS bucket, es, v FROM e),
        |rn AS (
        |  SELECT key, bucket, v,
        |    row_number() OVER (PARTITION BY key, bucket ORDER BY es, v) AS ra,
        |    row_number() OVER (PARTITION BY key, bucket ORDER BY es DESC, v DESC) AS rd
        |  FROM b),
        |agg AS (
        |  SELECT key, bucket, CAST(count(*) AS BIGINT) AS n,
        |    max(v) AS high, min(v) AS low
        |  FROM b GROUP BY 1, 2)
        |SELECT a.key, a.bucket, a.n, o.v AS open, a.high, a.low, c.v AS close
        |FROM agg a
        |JOIN (SELECT key, bucket, v FROM rn WHERE ra = 1) o USING (key, bucket)
        |JOIN (SELECT key, bucket, v FROM rn WHERE rd = 1) c USING (key, bucket)
        |ORDER BY key, bucket""".stripMargin,

    // KM replay: distinct-duration at-risk frame, the identical
    // ascending prefix-product fold (bit-stable, no rounding)
    "x_kaplan_meier" ->
      """WITH b AS (
        |  SELECT o_orderkey % 53 AS t, o_orderstatus = 'F' AS e FROM orders),
        |g AS (
        |  SELECT t, CAST(count(*) FILTER (WHERE e) AS BIGINT) AS n_event,
        |    CAST(count(*) FILTER (WHERE NOT e) AS BIGINT) AS n_censored
        |  FROM b GROUP BY t),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS N FROM b),
        |r AS (
        |  SELECT t, n_event, n_censored,
        |    CAST(N - coalesce(sum(n_event + n_censored) OVER
        |      (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
        |  FROM g CROSS JOIN n),
        |f AS (
        |  SELECT t, n_risk, n_event, n_censored,
        |    CAST(1 AS DOUBLE) - CAST(n_event AS DOUBLE) / n_risk AS f
        |  FROM r),
        |a AS (SELECT list(struct_pack(t := t, f := f) ORDER BY t) AS tf FROM f)
        |SELECT f.t, f.n_risk, f.n_event, f.n_censored,
        |  list_reduce(list_prepend(CAST(1.0 AS DOUBLE),
        |    [x.f FOR x IN a.tf IF x.t <= f.t]), (acc, x) -> acc * x) AS survival
        |FROM f CROSS JOIN a ORDER BY t""".stripMargin,

    "q_top_paths" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |    make_timestamp(epoch_ns(ts) // 1000) AS ts FROM events),
        |g AS (
        |  SELECT event_type AS s0,
        |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS s1,
        |    lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS s2
        |  FROM e)
        |SELECT s0 || ' > ' || s1 || ' > ' || s2 AS path, count(*) AS n
        |FROM g WHERE s1 IS NOT NULL AND s2 IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 15""".stripMargin,

    "q_active_trailing" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id AS u,
        |    CAST(make_timestamp(epoch_ns(ts) // 1000) AS DATE) AS day FROM events),
        |od AS (SELECT DISTINCT day FROM ud)
        |SELECT od.day AS day, count(DISTINCT ud.u) AS active_users
        |FROM od JOIN ud ON ud.day BETWEEN od.day - INTERVAL 6 DAY AND od.day
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_decay_score" ->
      """WITH e AS (
        |  SELECT user_id, value,
        |    CAST(make_timestamp(epoch_ns(ts) // 1000) AS DATE) AS day FROM events),
        |m AS (SELECT max(day) AS maxd FROM e)
        |SELECT user_id,
        |  round(CAST(sum(CAST(round(value / (1 + datediff('day', day, maxd)), 6)
        |    AS DECIMAL(24,6))) AS DOUBLE), 6) AS score,
        |  count(*) AS n_events
        |FROM e, m GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_twap" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tus, value FROM events),
        |l AS (
        |  SELECT user_id, tus, value,
        |    lead(tus) OVER (PARTITION BY user_id ORDER BY tus) AS nts
        |  FROM e)
        |SELECT user_id,
        |  round(CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * (nts - tus)
        |      AS DECIMAL(30,2))) AS DOUBLE) / sum(nts - tus), 6) AS twap,
        |  CAST(sum(nts - tus) AS BIGINT) AS span,
        |  count(*) AS n_intervals
        |FROM l WHERE nts IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_exact_corr" ->
      """WITH e AS (
        |  SELECT event_type,
        |    CAST(value AS DECIMAL(18,4)) AS x,
        |    CAST(hour(make_timestamp(epoch_ns(ts) // 1000)) AS DECIMAL(18,4)) AS y
        |  FROM events),
        |m AS (
        |  SELECT event_type, count(*) AS n,
        |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(x * y AS DECIMAL(30,8))) AS DOUBLE) AS sxy,
        |    CAST(sum(CAST(x * x AS DECIMAL(30,8))) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(y * y AS DECIMAL(30,8))) AS DOUBLE) AS syy
        |  FROM e GROUP BY 1)
        |SELECT event_type, n,
        |  round(CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
        |    (n * sxy - sx * sy) /
        |      (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) END, 6) AS corr
        |FROM m ORDER BY event_type""".stripMargin,

    "q_ab_test" ->
      """WITH u AS (
        |  SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS v, user_id,
        |    max(CASE WHEN event_type = 'purchase' AND value > 90 THEN 1 ELSE 0 END) AS c
        |  FROM events GROUP BY 1, 2),
        |pv AS (SELECT v, count(*) AS n, CAST(sum(c) AS BIGINT) AS conv FROM u GROUP BY v),
        |a AS (SELECT v AS variant_a, n AS n_a, conv AS conv_a FROM pv ORDER BY v LIMIT 1),
        |b AS (SELECT v AS variant_b, n AS n_b, conv AS conv_b FROM pv ORDER BY v DESC LIMIT 1)
        |SELECT variant_a, n_a, conv_a, variant_b, n_b, conv_b,
        |  round(conv_a / n_a, 6) AS rate_a,
        |  round(conv_b / n_b, 6) AS rate_b,
        |  round((conv_b / n_b - conv_a / n_a) / (conv_a / n_a), 6) AS lift,
        |  round((conv_b / n_b - conv_a / n_a) /
        |    sqrt(((conv_a + conv_b) / (n_a + n_b)) *
        |      (1 - (conv_a + conv_b) / (n_a + n_b)) *
        |      ((1.0 / n_a) + (1.0 / n_b))), 6) AS z
        |FROM a, b""".stripMargin,

    // power replay: the same per-user dedup and arm counts as
    // q_ab_test, then the sample-size formula in the same IEEE shape
    "x_power" ->
      """WITH u AS (
        |  SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS v, user_id,
        |    max(CASE WHEN event_type = 'purchase' AND value > 90 THEN 1 ELSE 0 END) AS c
        |  FROM events GROUP BY 1, 2),
        |pv AS (SELECT v, count(*) AS n, CAST(sum(c) AS BIGINT) AS conv FROM u GROUP BY v),
        |a AS (SELECT v AS variant_a, n AS n_a, conv AS conv_a FROM pv ORDER BY v LIMIT 1),
        |b AS (SELECT v AS variant_b, n AS n_b, conv AS conv_b FROM pv ORDER BY v DESC LIMIT 1),
        |j AS (
        |  SELECT variant_a, variant_b, n_a, n_b,
        |    round(conv_a / n_a, 6) AS rate_a, round(conv_b / n_b, 6) AS rate_b,
        |    conv_a / n_a AS pa, conv_b / n_b AS pb
        |  FROM a, b),
        |k AS (
        |  SELECT *,
        |    CAST(ceil(((1.959964 + 0.841621) * (1.959964 + 0.841621)) *
        |      (pa * (1.0 - pa) + pb * (1.0 - pb)) /
        |      ((pb - pa) * (pb - pa))) AS BIGINT) AS need
        |  FROM j)
        |SELECT variant_a, variant_b, CAST(n_a AS BIGINT) AS n_a,
        |  CAST(n_b AS BIGINT) AS n_b, rate_a, rate_b,
        |  CASE WHEN pa != pb THEN need END AS required_n_per_arm,
        |  CASE WHEN pa != pb THEN least(CAST(n_a AS DOUBLE), CAST(n_b AS DOUBLE)) >= need END AS powered
        |FROM k""".stripMargin,

    "q_rollup_maintain" ->
      """SELECT CAST(make_timestamp(epoch_ns(ts) // 1000) AS DATE) AS day,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v_sum
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // weighted-percentile replay: distinct-value cumulative weights,
    // the prev_cum < ceil(p*W) <= cum pick CROSS-MULTIPLIED in exact
    // integer arithmetic (cum*den >= num*W), matching the engine —
    // no float rank ever computed on either side
    "x_weighted_pct" ->
      """WITH c AS (
        |  SELECT CAST(l_extendedprice AS DOUBLE) AS v,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS wc
        |  FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL AND l_quantity > 0
        |  GROUP BY 1),
        |w AS (
        |  SELECT v, wc,
        |    sum(wc) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
        |    (SELECT CAST(sum(wc) AS BIGINT) FROM c) AS W
        |  FROM c),
        |t AS (SELECT CAST(p AS DOUBLE) AS p, num, den FROM (VALUES
        |  (0.25, CAST(25 AS HUGEINT), CAST(100 AS HUGEINT)),
        |  (0.5,  CAST(5 AS HUGEINT),  CAST(10 AS HUGEINT)),
        |  (0.75, CAST(75 AS HUGEINT), CAST(100 AS HUGEINT)),
        |  (0.95, CAST(95 AS HUGEINT), CAST(100 AS HUGEINT))) AS q(p, num, den))
        |SELECT t.p, min(w.v) AS value
        |FROM t JOIN w
        |  ON CAST(w.cum AS HUGEINT) * t.den >= t.num * w.W
        | AND CAST(w.cum - w.wc AS HUGEINT) * t.den < t.num * w.W
        |GROUP BY t.p ORDER BY t.p""".stripMargin,

    "q_quantile_bins" -> {
      // discrete (type-1) edges selected by INTEGER rank — replays the
      // engine's exact arithmetic; interpolated quantile_cont is
      // ulp-ambiguous vs Spark's percentile at tied-run boundaries
      val edgeList = (1 to 9)
        .map(i => s"min(CASE WHEN cum >= ($i * nn.n + 9) // 10 THEN v END)")
        .mkString("[", ", ", "]")
      val caseSum = (1 to 9)
        .map(i => s"(CASE WHEN value > edges[$i] THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH e AS (SELECT event_id, value FROM events),
         |cnt AS (SELECT value AS v, count(*) AS c FROM e WHERE value IS NOT NULL GROUP BY 1),
         |cum0 AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM cnt),
         |nn AS (SELECT max(cum) AS n FROM cum0),
         |ed AS (SELECT $edgeList AS edges FROM cum0, nn),
         |b AS (SELECT event_id, value, edges, 1 + $caseSum AS bin FROM e, ed)
         |SELECT event_id, value, CAST(bin AS INTEGER) AS bin,
         |  CASE WHEN bin = 1 THEN NULL ELSE round(edges[bin - 1], 6) END AS bin_lower
         |FROM b ORDER BY event_id""".stripMargin
    },

    "q_profile" ->
      """WITH s AS (SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate FROM orders)
        |SELECT * FROM (
        |  SELECT 'o_orderdate' AS "column", count(o_orderdate) AS n,
        |    count(*) FILTER (o_orderdate IS NULL) AS nulls,
        |    count(DISTINCT o_orderdate) AS n_distinct,
        |    CAST(min(o_orderdate) AS VARCHAR) AS min_s,
        |    CAST(max(o_orderdate) AS VARCHAR) AS max_s,
        |    CAST(NULL AS DOUBLE) AS mean FROM s
        |  UNION ALL
        |  SELECT 'o_orderkey', count(o_orderkey),
        |    count(*) FILTER (o_orderkey IS NULL),
        |    count(DISTINCT o_orderkey),
        |    CAST(min(o_orderkey) AS VARCHAR), CAST(max(o_orderkey) AS VARCHAR),
        |    round(CAST(sum(CAST(o_orderkey AS DECIMAL(30,6))) AS DOUBLE) / count(o_orderkey), 6) FROM s
        |  UNION ALL
        |  SELECT 'o_orderstatus', count(o_orderstatus),
        |    count(*) FILTER (o_orderstatus IS NULL),
        |    count(DISTINCT o_orderstatus),
        |    CAST(min(o_orderstatus) AS VARCHAR), CAST(max(o_orderstatus) AS VARCHAR),
        |    CAST(NULL AS DOUBLE) FROM s
        |  UNION ALL
        |  SELECT 'o_totalprice', count(o_totalprice),
        |    count(*) FILTER (o_totalprice IS NULL),
        |    count(DISTINCT o_totalprice),
        |    CAST(min(o_totalprice) AS VARCHAR), CAST(max(o_totalprice) AS VARCHAR),
        |    round(CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) / count(o_totalprice), 6) FROM s)
        |ORDER BY "column"""".stripMargin,

    "q_winsorize" ->
      """WITH e AS (SELECT event_id, value FROM events),
        |ed AS (SELECT quantile_cont(value, 0.05) AS lo,
        |              quantile_cont(value, 0.95) AS hi FROM e)
        |SELECT event_id, value,
        |  round(greatest(least(value, ed.hi), ed.lo), 6) AS value_w
        |FROM e, ed ORDER BY event_id""".stripMargin,

    "q_mad_outliers" ->
      """WITH e AS (SELECT event_id, value FROM events),
        |m AS (SELECT quantile_cont(value, 0.5) AS med FROM e),
        |d AS (SELECT quantile_cont(abs(value - m.med), 0.5) AS mad,
        |        any_value(m.med) AS med FROM e, m)
        |SELECT event_id, value,
        |  round(abs(value - d.med) / (d.mad * 1.4826), 6) AS robust_z
        |FROM e, d
        |WHERE d.mad > 0 AND abs(value - d.med) / (d.mad * 1.4826) > 3.5
        |ORDER BY event_id""".stripMargin,

    "q_snapshot_diff" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |old AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 11 = 0 THEN o_totalprice + 1.0
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM base WHERE o_orderkey % 97 != 3),
        |nw AS (SELECT * FROM base WHERE o_orderkey % 89 != 7),
        |d AS (
        |  SELECT coalesce(n.o_orderkey, o.o_orderkey) AS o_orderkey,
        |    CASE WHEN n.o_orderkey IS NULL THEN 'D'
        |         WHEN o.o_orderkey IS NULL THEN 'I'
        |         WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
        |           OR o.o_totalprice IS DISTINCT FROM n.o_totalprice THEN 'U'
        |    END AS op,
        |    CASE WHEN n.o_orderkey IS NOT NULL AND o.o_orderkey IS NOT NULL THEN
        |      concat_ws(',',
        |        CASE WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
        |          THEN 'o_orderstatus' END,
        |        CASE WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice
        |          THEN 'o_totalprice' END)
        |    ELSE '' END AS changed_cols
        |  FROM old o FULL OUTER JOIN nw n ON o.o_orderkey = n.o_orderkey)
        |SELECT o_orderkey, op, changed_cols FROM d WHERE op IS NOT NULL
        |ORDER BY o_orderkey""".stripMargin,

    "q_bloom_prune" ->
      """SELECT l.l_returnflag, count(*) AS n,
        |  CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderpriority = '1-URGENT'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_interval_merge" ->
      """WITH iv AS (
        |  SELECT user_id, epoch_ns(ts) // 1000000000 AS s,
        |    epoch_ns(ts) // 1000000000 + CAST(floor(value * 10) AS BIGINT) AS e
        |  FROM events),
        |g AS (
        |  SELECT user_id, s, e,
        |    CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END AS ni
        |  FROM (
        |    SELECT user_id, s, e,
        |      max(e) OVER (PARTITION BY user_id ORDER BY s, e
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |    FROM iv)),
        |h AS (
        |  SELECT user_id, s, e,
        |    sum(ni) OVER (PARTITION BY user_id ORDER BY s, e
        |      ROWS UNBOUNDED PRECEDING) AS island
        |  FROM g)
        |SELECT user_id, min(s) AS island_start, max(e) AS island_end,
        |  count(*) AS n_spans, max(e) - min(s) AS covered
        |FROM h GROUP BY user_id, island
        |ORDER BY user_id, island_start""".stripMargin,

    "q_interval_coverage" ->
      """WITH iv AS (
        |  SELECT user_id, epoch_ns(ts) // 1000000000 AS s,
        |    epoch_ns(ts) // 1000000000 + CAST(floor(value * 10) AS BIGINT) AS e
        |  FROM events),
        |g AS (
        |  SELECT user_id, s, e,
        |    CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END AS ni
        |  FROM (
        |    SELECT user_id, s, e,
        |      max(e) OVER (PARTITION BY user_id ORDER BY s, e
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |    FROM iv)),
        |h AS (
        |  SELECT user_id, s, e,
        |    sum(ni) OVER (PARTITION BY user_id ORDER BY s, e
        |      ROWS UNBOUNDED PRECEDING) AS island
        |  FROM g),
        |isl AS (
        |  SELECT user_id, min(s) AS island_start, max(e) AS island_end,
        |    count(*) AS n_spans, max(e) - min(s) AS covered
        |  FROM h GROUP BY user_id, island)
        |SELECT user_id, CAST(sum(covered) AS BIGINT) AS total_covered,
        |  count(*) AS n_islands, max(n_spans) AS max_island_spans
        |FROM isl GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_attribution" ->
      """WITH ev AS (
        |  SELECT event_id, user_id,
        |    CAST(date_trunc('second', ts) AS TIMESTAMP) AS tss, event_type, value
        |  FROM events),
        |p AS (SELECT event_id, user_id, tss, value FROM ev WHERE event_type = 'purchase'),
        |t AS (
        |  SELECT user_id, tss AS touch_ts, max(event_type) AS touch_type
        |  FROM ev WHERE event_type != 'purchase' GROUP BY 1, 2)
        |SELECT
        |  CASE WHEN t.touch_ts >= p.tss - INTERVAL 30 MINUTE
        |    THEN t.touch_type ELSE 'none' END AS attributed,
        |  count(*) AS conversions,
        |  CAST(sum(CAST(p.value AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM p ASOF LEFT JOIN t
        |  ON p.user_id = t.user_id AND p.tss >= t.touch_ts
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_golden_record" ->
      """WITH v AS (
        |  SELECT c_custkey, 1 AS seq, c_name AS name,
        |    CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE c_mktsegment END AS seg,
        |    c_acctbal AS bal FROM customer
        |  UNION ALL
        |  SELECT c_custkey, 2, substr(c_name, 1, 10),
        |    c_mktsegment, c_acctbal - 5.0 FROM customer)
        |SELECT c_custkey, max(bal) AS bal,
        |  arg_max(name, length(name)) AS name,
        |  arg_max(seg, CASE WHEN seg IS NOT NULL THEN 10 + seq ELSE seq END) AS seg,
        |  count(*) AS n_merged
        |FROM v GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    // SCD2 merge replay: full-outer join, close-on-diff + reopen
    "q_scd2_merge" ->
      """WITH cur_open AS (
        |  SELECT c_custkey, c_mktsegment AS segment,
        |    TIMESTAMP '2020-01-01 00:00:00' AS valid_from,
        |    CAST(NULL AS TIMESTAMP) AS valid_to
        |  FROM customer WHERE c_custkey % 2 = 0),
        |cur_closed AS (
        |  SELECT c_custkey, 'OLD' AS segment,
        |    TIMESTAMP '2019-01-01 00:00:00' AS valid_from,
        |    TIMESTAMP '2020-01-01 00:00:00' AS valid_to
        |  FROM customer WHERE c_custkey % 2 = 0 AND c_custkey % 7 = 0),
        |upd AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 3 = 0 THEN 'CHANGED' ELSE c_mktsegment END AS segment,
        |    TIMESTAMP '2021-06-01 00:00:00' AS eff
        |  FROM customer WHERE c_custkey % 5 < 3),
        |j AS (
        |  SELECT o.c_custkey AS o_key, o.segment AS o_seg, o.valid_from AS o_vf,
        |         u.c_custkey AS u_key, u.segment AS u_seg, u.eff
        |  FROM cur_open o FULL OUTER JOIN upd u ON o.c_custkey = u.c_custkey)
        |SELECT * FROM (
        |  SELECT o_key AS c_custkey, o_seg AS segment, o_vf AS valid_from,
        |    CASE WHEN u_key IS NOT NULL AND u_seg IS DISTINCT FROM o_seg
        |         THEN eff END AS valid_to
        |  FROM j WHERE o_key IS NOT NULL
        |  UNION ALL
        |  SELECT u_key, u_seg, eff, NULL FROM j
        |  WHERE u_key IS NOT NULL AND (o_key IS NULL OR u_seg IS DISTINCT FROM o_seg)
        |  UNION ALL
        |  SELECT c_custkey, segment, valid_from, valid_to FROM cur_closed)
        |ORDER BY c_custkey, valid_from""".stripMargin,

    // interval reconstruction: collapse unchanged runs, lead() closes
    "q_dim_history" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type,
        |    make_timestamp(epoch_ns(ts) // 1000) AS ts
        |  FROM events),
        |c AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM e),
        |ch AS (SELECT * FROM c WHERE rn = 1 OR prev IS DISTINCT FROM event_type)
        |SELECT user_id, event_type, ts AS valid_from,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        |FROM ch ORDER BY user_id, valid_from, event_type""".stripMargin
  )
}
