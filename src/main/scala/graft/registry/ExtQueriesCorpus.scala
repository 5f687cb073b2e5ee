package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{Cleanse, Enrich, Flatten, Upsert}
import graft.ext.{Dedup, Similarity, TextOps}
import graft.registry.Fixtures._

/** LLM-pipeline extension registry — corpus profiling, sketches, and table statistics.
  * Split from the former monolithic ExtQueries (r14):
  * pure relocation, no query or oracle text changed.
  */
private[graft] object ExtQueriesCorpus {
  import ExtQueries.{hashPinVerdict, textRoundtrip, xlsxArtifactHash, xlsxBytePins}

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_split" -> ((s, d) =>
      // deterministic train/val/test assignment (growth-stable FNV
      // membership, seed 13), summarized per split × lang
      graft.ext.Corpus.assignSplit(t(s, d, "documents"), "doc_id")
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
        .orderBy("split", "lang")),

    "x_group_split" -> ((s, d) => {
      // leakage-safe split: hash the GROUP (source), not the doc —
      // every doc of a source lands in ONE split (GroupShuffleSplit
      // semantics; membership is a pure function of the group value,
      // a narrow map with no group-list collect) — then the
      // independent audit: leaked_groups must come out 0. Seed 17:
      // the 20 sources land 14/3/3 across train/val/test (seed 13
      // leaves val empty at every driver SF)
      val split = graft.ext.Corpus.assignSplit(
        t(s, d, "documents"), "source", seed = 17L)
      graft.ext.Corpus.splitAudit(split, "source", "split")
    }),

    "x_rp_sketch" -> ((s, d) =>
      // Johnson–Lindenstrauss Rademacher projection 64 -> 16 dims:
      // pure per-row fold (no shuffle, no UDF), integer-derived sign
      // matrix, exact 1/sqrt(16) scale — BIT-EXACT vs the oracle's
      // identical left-fold, zero rounding steps anywhere
      graft.ext.Similarity.randomProject(
        t(s, d, "embeddings"), "embedding", "vec_id", dIn = 64, kOut = 16)
        .orderBy("id", "dim")),

    "x_rp_distance" -> ((s, d) =>
      // the JL lemma's empirical check on a 40-vector sample (780
      // pairs): projected/original distance ratio per pair at 6 dp,
      // decimal-exact mean. k=16 is a COARSE sketch (eps ~
      // sqrt(8 ln n / k) ~ 1.35 at n=40, measured tail ~0.25..2.5)
      // so the per-pair band [0.55, 1.45] gates the ~72% bulk. The
      // 780 ratios share only k=16 projection dims, so the MEAN's
      // effective dof is ~k, not ~n_pairs (measured 0.84..1.02
      // across driver SFs) -> its band is [0.75, 1.25], not the
      // 1/sqrt(780) one
      graft.ext.Similarity.projDistortion(
        t(s, d, "embeddings").filter(col("vec_id") < 40),
        "embedding", "vec_id", dIn = 64, kOut = 16,
        lo = 0.55, hi = 1.45, minFracInBand = 0.65,
        meanLo = 0.75, meanHi = 1.25)),

    "x_nfc" -> ((s, d) => {
      // unicode canonicalization (codegen'd java.text.Normalizer): NFD
      // text synthesized by suffixing e + COMBINING ACUTE composes to
      // é — length drops by one, content diverges from the raw form
      val syn = concat(col("text"), lit("e\u0301"))
      t(s, d, "documents")
        .select(col("doc_id"),
          length(syn).cast("long").as("n_raw"),
          length(graft.functions.TextNormalize.nfc(syn)).cast("long").as("n_nfc"),
          (syn =!= graft.functions.TextNormalize.nfc(syn)).as("changed"))
        .orderBy("doc_id")
    }),

    "x_sessionize_batch" -> ((s, d) =>
      // session_window in batch mode: 30-min inactivity gap per user
      events(s, d)
        .withColumn("tss", date_trunc("second", col("ts_us")))
        .groupBy(session_window(col("tss"), "30 minutes").as("sw"), col("user_id"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
        .select(col("user_id"), col("sw.start").as("session_start"),
          col("sw.end").as("session_end"), col("n"), col("total_value"))
        .orderBy("user_id", "session_start")),

    "x_approx_distinct" -> ((s, d) =>
      // ORACLE-GATED sketch verdict: the HLL estimates are engine-
      // specific, but the 5% error contract is not — both the sketch
      // and the exact distinct count run engine-side and the driver
      // gate hash-matches the literal bound verdicts
      // rsd=0.02: the sketch's own std error sits well inside the 5%
      // verdict bound at every scale factor (the default 0.05 rsd can
      // legitimately exceed 5% on one given dataset)
      t(s, d, "lineitem").agg(
          approx_count_distinct(col("l_orderkey"), 0.02).as("ao"),
          countDistinct(col("l_orderkey")).as("eo"),
          approx_count_distinct(col("l_partkey"), 0.02).as("ap"),
          countDistinct(col("l_partkey")).as("ep"))
        .select(explode(array(
          struct(lit("orders_hll_err_lt_5pct").as("check_name"),
            (abs(col("ao") - col("eo")).cast("double") / col("eo") < 0.05).as("ok")),
          struct(lit("parts_hll_err_lt_5pct").as("check_name"),
            (abs(col("ap") - col("ep")).cast("double") / col("ep") < 0.05).as("ok")))).as("c"))
        .select(col("c.check_name").as("check_name"), col("c.ok").as("ok"))
        .orderBy("check_name")),

    "x_profile_approx" -> ((s, d) => {
      // ORACLE-GATED verdicts for the documented 100 TB profile
      // configuration: `exactDistinct = false` swaps the one genuinely
      // heavy metric (multi-countDistinct plans via EXPAND — ~5× input
      // replication pre-shuffle) for one-pass HLL. The estimates are
      // engine-specific; the contract is not: per column the HLL
      // n_distinct must sit within 10% of the engine-side exact count
      // (HLL default rsd 0.05 → 2σ), and EVERY other metric
      // (n/nulls/min/max/mean) must be bit-identical between the two
      // configurations — so a regression in the approx path fails the
      // driver gate, not just prose in SCALE.md
      val base = t(s, d, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
      val exact = graft.ops.Validate.profile(base)
      val approx = graft.ops.Validate.profile(base, exactDistinct = false)
      exact.as("e").join(approx.as("a"), Seq("column"))
        .select(col("column"),
          (abs(col("a.n_distinct") - col("e.n_distinct")).cast("double")
            / col("e.n_distinct") < 0.10).as("hll_err_lt_10pct"),
          (col("a.n") === col("e.n") && col("a.nulls") === col("e.nulls") &&
            col("a.min_s") <=> col("e.min_s") && col("a.max_s") <=> col("e.max_s") &&
            col("a.mean") <=> col("e.mean")).as("other_metrics_exact"))
        .orderBy("column")
    }),

    "x_benford" -> ((s, d) =>
      // Benford first-significant-digit drift over order amounts —
      // the fraud/fabrication tripwire. Digit via integer formatting
      // of floor(amount·100) (no log10 edge cases); chi-square terms
      // from the shared ×10⁶ expectation constants in a fixed double
      // shape, so the oracle's doubles are bit-identical
      graft.ops.Validate.benford(t(s, d, "orders"), "o_totalprice")),

    "x_length_batches" -> ((s, d) =>
      // group_by_length training-loader prep: per-source length-sorted
      // 32-doc batches with their padding-waste readout — the only
      // window is per-shard (global sorts are exactly what a
      // 1000-executor batching job must not do)
      graft.ext.Corpus.lengthBatches(
        t(s, d, "documents"), "source", "doc_id", "n_chars",
        batchSize = 32)),

    "x_gini" -> ((s, d) =>
      // corpus concentration: Lorenz curve + Gini of character mass
      // per source — the "one megasite in a trenchcoat" readout behind
      // RefinedWeb-style per-domain caps. One corpus pass; windows run
      // over the post-agg per-source frame only, every sum
      // integer-exact
      graft.ext.Corpus.concentration(
        t(s, d, "documents"), "source", "n_chars")),

    "x_diversity" -> ((s, d) =>
      // per-source language diversity: entropy + effective language
      // count — the datasheet composition readout (one (source, lang)
      // cell agg, broadcast totals)
      graft.ext.Corpus.labelDiversity(t(s, d, "documents"),
        "source", "lang")),

    "x_skew_report" -> ((s, d) =>
      // join-key skew diagnostic over the fact table's supplier key —
      // the pre-salting inspection; deterministic tie order
      graft.ops.Validate.skewReport(t(s, d, "lineitem"), "l_suppkey", topK = 10)
        .orderBy("rank")),

    "x_active_trailing_hll" -> ((s, d) => {
      // ORACLE-GATED sketch verdict: the per-day HLL trailing-actives
      // estimates (shuffle independent of user count) must each land
      // within 5% of the exact operator's count — both frames computed
      // engine-side, joined on day, worst-case error checked
      val appr = graft.ext.Behavior.activeUsersTrailingApprox(events(s, d),
          "user_id", "ts_us", windowDays = 7)
        .withColumnRenamed("active_users_est", "a_est")
      val exact = graft.ext.Behavior.activeUsersTrailing(events(s, d),
          "user_id", "ts_us", windowDays = 7)
        .withColumnRenamed("active_users", "a_exact")
      appr.join(exact, Seq("day"), "full")
        .agg(
          (count(when(col("a_est").isNull || col("a_exact").isNull, 1)) === 0)
            .as("days_align"),
          (max(abs(col("a_est") - col("a_exact")).cast("double") / col("a_exact")) < 0.05)
            .as("err_ok"))
        .select(explode(array(
          struct(lit("hll_day_sets_align").as("check_name"), col("days_align").as("ok")),
          struct(lit("hll_trailing_err_lt_5pct").as("check_name"), col("err_ok").as("ok"))))
          .as("c"))
        .select(col("c.check_name").as("check_name"), col("c.ok").as("ok"))
        .orderBy("check_name")
    }),

    "x_compression_ratio" -> ((s, d) =>
      // zlib quality signal over the documents table: boilerplate
      // compresses away, entropy soup doesn't (rows-only: a JVM codec
      // has no SQL replay; TextOpsSpec pins the ordering properties
      // and partitioning determinism)
      graft.ext.TextOps.compressionRatio(
        t(s, d, "documents").select(col("doc_id"), col("text")),
        "text", "doc_id")
        .orderBy("id")),

    "x_compression_ratio_check" -> ((s, d) => {
      // ORACLE-GATED verdict companion to x_compression_ratio (which is
      // rows-only because a JVM zlib codec has no SQL replay): the
      // ordering and determinism properties TextOpsSpec pins are
      // re-derived engine-side as boolean checks the driver can gate.
      //  - crafted fixture: repeated boilerplate must compress away
      //    (< 0.1), seeded random noise must not (> 0.5), varied prose
      //    strictly between — the separations are wide (≈0.04 / 0.5 /
      //    1.0) so the bounds are structural, not tuned
      //  - determinism: ratios over the real documents table must be
      //    byte-identical at 1 vs 7 input partitions (one Deflater is
      //    re-init'd per partition — any partition-coupled state leak
      //    breaks this)
      import s.implicits._
      val rnd = new scala.util.Random(8)
      val fixture = Seq(
        (1L, "the same line repeats here\n" * 50),
        (2L, "a reasonably varied prose paragraph about spark engines " +
          "discussing partitions shuffles and the optimizer in detail " +
          "with enough distinct words to resist the dictionary" * 3),
        (3L, Seq.fill(1500)(('a' + rnd.nextInt(26)).toChar).mkString)
      ).toDF("doc_id", "text")
      val w = graft.ext.TextOps.compressionRatio(fixture, "text", "doc_id")
        .groupBy()
        .agg(
          max(when(col("id") === 1L, col("compression_ratio"))).as("boiler"),
          max(when(col("id") === 2L, col("compression_ratio"))).as("prose"),
          max(when(col("id") === 3L, col("compression_ratio"))).as("noise"))
      val real = t(s, d, "documents").select(col("doc_id"), col("text"))
      val a = graft.ext.TextOps.compressionRatio(real.repartition(1), "text", "doc_id")
      val b = graft.ext.TextOps.compressionRatio(real.repartition(7), "text", "doc_id")
      val det = a.exceptAll(b).unionAll(b.exceptAll(a))
        .agg((count(lit(1)) === 0).as("det_ok"))
      w.crossJoin(broadcast(det))
        .select(explode(array(
          struct(lit("ratio_orders_boiler_prose_noise").as("check_name"),
            (col("boiler") < col("prose") && col("prose") < col("noise")).as("ok")),
          struct(lit("ratio_bounds_structural").as("check_name"),
            (col("boiler") < 0.1 && col("noise") > 0.5).as("ok")),
          struct(lit("ratio_partition_deterministic").as("check_name"),
            col("det_ok").as("ok")))).as("c"))
        .select(col("c.check_name").as("check_name"), col("c.ok").as("ok"))
        .orderBy("check_name")
    }),

    "x_compression_ratio_hash" -> ((s, d) =>
      hashPinVerdict(s, d, "x_compression_ratio")),

    "x_heavy_hitters" -> ((s, d) =>
      // SpaceSaving heavy hitters over event_type with capacity >>
      // distinct keys: no counter evicts, so the sketch is provably
      // EXACT (err=0) and the full oracle hash-match applies — the
      // custom TypedImperativeAggregate shuffles O(capacity) summaries,
      // never raw keys
      events(s, d)
        .agg(graft.functions.VectorExpressions
          .spaceSavingTopK(col("event_type"), 64).as("hh"))
        .select(explode(col("hh")).as("h"))
        .select(col("h.key").as("key"), col("h.est").as("n"),
          col("h.err").as("err"), col("h.total").as("total"))
        .orderBy(col("n").desc, col("key"))),

    "x_heavy_hitters_approx" -> ((s, d) => {
      // ORACLE-GATED sketch verdict for the eviction regime (150+ users
      // against 32 counters — the surviving tail set legitimately
      // depends on merge order, so the ROWS can't be oracled, but the
      // SpaceSaving GUARANTEES can): engine-side exact counts prove
      // (a) the total is exact, (b) every key with freq > N/capacity
      // survived, (c) every estimate brackets its true count
      // (est − err ≤ true ≤ est)
      val hh = events(s, d)
        .agg(graft.functions.VectorExpressions
          .spaceSavingTopK(col("user_id").cast("string"), 32).as("hh"))
        .select(explode(col("hh")).as("h"))
        .select(col("h.key").as("key"), col("h.est").as("est"),
          col("h.err").as("err"), col("h.total").as("total"))
      val exact = events(s, d).groupBy(col("user_id").cast("string").as("key"))
        .agg(count(lit(1)).as("cnt"))
      val n = events(s, d).agg(count(lit(1)).as("n"))
      val totalOk = hh.crossJoin(broadcast(n))
        .agg((count(when(col("total") =!= col("n"), 1)) === 0).as("ok"))
        .select(lit("total_is_exact_count").as("check_name"), col("ok"))
      val heavyPresent = exact.crossJoin(broadcast(n))
        .filter(col("cnt") > col("n") / 32)
        .join(hh.select(col("key"), lit(1).as("__in")), Seq("key"), "left")
        .agg((count(when(col("__in").isNull, 1)) === 0).as("ok"))
        .select(lit("all_heavy_keys_survive").as("check_name"), col("ok"))
      val bracketOk = hh.join(exact, Seq("key"), "left")
        .agg((count(when(col("cnt").isNull ||
          col("est") < col("cnt") || col("est") - col("err") > col("cnt"), 1)) === 0)
          .as("ok"))
        .select(lit("estimates_bracket_truth").as("check_name"), col("ok"))
      totalOk.unionByName(heavyPresent).unionByName(bracketOk)
        .orderBy("check_name")
    }),

    "x_approx_quantiles" -> ((s, d) => {
      // ORACLE-GATED sketch verdict: each approximate quantile's true
      // rank (fraction of values at or below it, computed engine-side)
      // must sit within ±1% of the target percentile — the documented
      // accuracy of the sketch at 10000, checked without ever exposing
      // the engine-specific quantile values to the oracle
      val ps = Seq(0.25, 0.5, 0.75, 0.95)
      val qs = t(s, d, "lineitem")
        .agg(percentile_approx(col("l_extendedprice"),
          array(ps.map(lit): _*), lit(10000)).as("qs"))
      t(s, d, "lineitem").select(col("l_extendedprice").as("v"))
        .crossJoin(broadcast(qs))
        .select(col("v"), posexplode(col("qs")).as(Seq("i", "q")))
        .groupBy(col("i"))
        .agg(avg(when(col("v") <= col("q"), 1.0).otherwise(0.0)).as("frac"))
        .select(col("i"),
          element_at(array(ps.map(lit): _*), col("i") + 1).as("p"),
          (abs(col("frac") - element_at(array(ps.map(lit): _*), col("i") + 1)) <= 0.01)
            .as("ok"))
        .orderBy("i")
    }),

    "x_datasheet" -> ((s, d) =>
      // corpus release datasheet: totals, per-lang/source composition
      // with fractions, discrete length percentiles — one uniform
      // (section, key, n, v) frame
      graft.ext.Corpus.datasheet(t(s, d, "documents"),
          "text", "doc_id", "lang", "source")
        .orderBy("section", "key")),
  )

  val oracles: Map[String, String] = Map(
    // split-band membership replay (seed 13; bands on millionth
    // boundaries: train < 800000 ≤ val < 900000 ≤ test)
    "x_split" ->
      s"""WITH h AS (
         |  SELECT doc_id, lang, n_chars,
         |    ${fnvSql("(coalesce(CAST(doc_id AS VARCHAR), chr(0) || 'null') || ':13')")} AS hu
         |  FROM documents),
         |m AS (
         |  SELECT lang, n_chars,
         |    ((${signedSql("hu")} % 1000000) + 1000000) % 1000000 AS b
         |  FROM h)
         |SELECT CASE WHEN b < 800000 THEN 'train' WHEN b < 900000 THEN 'val' ELSE 'test' END AS split,
         |  lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_chars
         |FROM m GROUP BY 1, 2 ORDER BY split, lang""".stripMargin,

    // group-split replay: FNV band on the GROUP key, then the audit —
    // per-split row/group counts + global straddling-group count
    "x_group_split" ->
      s"""WITH h AS (
         |  SELECT source,
         |    ${fnvSql("(coalesce(CAST(source AS VARCHAR), chr(0) || 'null') || ':17')")} AS hu
         |  FROM documents),
         |m AS (
         |  SELECT source,
         |    ((${signedSql("hu")} % 1000000) + 1000000) % 1000000 AS b
         |  FROM h),
         |a AS (
         |  SELECT source,
         |    CASE WHEN b < 800000 THEN 'train' WHEN b < 900000 THEN 'val' ELSE 'test' END AS split
         |  FROM m),
         |l AS (
         |  SELECT CAST(count(*) FILTER (WHERE ns > 1) AS BIGINT) AS leaked_groups
         |  FROM (SELECT source, count(DISTINCT split) AS ns FROM a GROUP BY source))
         |SELECT split, CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(count(DISTINCT source) AS BIGINT) AS n_groups, leaked_groups
         |FROM a CROSS JOIN l GROUP BY split, leaked_groups ORDER BY split""".stripMargin,

    // JL-projection replay: identical integer sign matrix, identical
    // left fold, exact 0.25 scale — bit-equal, no rounding anywhere
    "x_rp_sketch" ->
      """WITH j AS (SELECT unnest(range(0, 16)) AS dim),
        |p AS (
        |  SELECT e.vec_id AS id, j.dim,
        |    0.25 * list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      [CAST(e.embedding[i] AS DOUBLE) *
        |         (CASE WHEN ((CAST(i - 1 AS BIGINT) * 2654435761 + j.dim * 40503) % 97) < 49
        |               THEN 1.0 ELSE -1.0 END)
        |       FOR i IN range(1, 65)]), (acc, x) -> acc + x) AS y
        |  FROM embeddings e CROSS JOIN j)
        |SELECT id, CAST(dim AS INTEGER) AS dim, y FROM p ORDER BY id, dim""".stripMargin,

    // JL-distortion replay: project the 40-vector sample with the same
    // fold, all 780 pair ratios (sqrt is IEEE-exact; the 6-dp rounding
    // of the ratio and of the mean replays via the VARCHAR->DECIMAL
    // shortest-repr trick), decimal-exact mean, the same verdict band
    "x_rp_distance" ->
      """WITH s AS (SELECT vec_id AS id, embedding AS v FROM embeddings WHERE vec_id < 40),
        |j AS (SELECT unnest(range(0, 16)) AS dim),
        |p AS (
        |  SELECT s.id, j.dim,
        |    0.25 * list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      [CAST(s.v[i] AS DOUBLE) *
        |         (CASE WHEN ((CAST(i - 1 AS BIGINT) * 2654435761 + j.dim * 40503) % 97) < 49
        |               THEN 1.0 ELSE -1.0 END)
        |       FOR i IN range(1, 65)]), (acc, x) -> acc + x) AS y
        |  FROM s CROSS JOIN j),
        |yv AS (SELECT id, list(y ORDER BY dim) AS yv FROM p GROUP BY id),
        |b AS (SELECT s.id, s.v, yv.yv FROM s JOIN yv USING (id)),
        |pr AS (
        |  SELECT
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      [(CAST(a.v[i] AS DOUBLE) - CAST(bb.v[i] AS DOUBLE)) *
        |       (CAST(a.v[i] AS DOUBLE) - CAST(bb.v[i] AS DOUBLE))
        |       FOR i IN range(1, 65)]), (acc, x) -> acc + x) AS dx2,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      [(a.yv[i] - bb.yv[i]) * (a.yv[i] - bb.yv[i])
        |       FOR i IN range(1, 17)]), (acc, x) -> acc + x) AS dy2
        |  FROM b a JOIN b bb ON a.id < bb.id),
        |r AS (
        |  SELECT CAST(round(CAST(CAST(sqrt(dy2) / sqrt(dx2) AS VARCHAR) AS DECIMAL(38,30)), 6) AS DOUBLE) AS r
        |  FROM pr WHERE dx2 > 0),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |    CAST(round(CAST(CAST(CAST(sum(CAST(r AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS VARCHAR) AS DECIMAL(38,30)), 6) AS DOUBLE) AS mean_distortion,
        |    min(r) AS min_distortion, max(r) AS max_distortion,
        |    round(CAST(count(*) FILTER (WHERE r >= 0.55 AND r <= 1.45) AS DOUBLE) / count(*), 6) AS frac_in_band
        |  FROM r)
        |SELECT n_pairs, mean_distortion, min_distortion, max_distortion, frac_in_band,
        |  mean_distortion >= 0.75 AND mean_distortion <= 1.25 AS mean_ok,
        |  frac_in_band >= 0.65 AS band_ok
        |FROM agg""".stripMargin,

    "x_nfc" ->
      """SELECT doc_id,
        |  length(text || 'e' || chr(769)) AS n_raw,
        |  length(nfc_normalize(text || 'e' || chr(769))) AS n_nfc,
        |  (text || 'e' || chr(769)) != nfc_normalize(text || 'e' || chr(769)) AS changed
        |FROM documents ORDER BY doc_id""".stripMargin,

    "x_sessionize_batch" ->
      """WITH e AS (
        |  SELECT user_id, CAST(date_trunc('second', ts) AS TIMESTAMP) AS tss, value FROM events),
        |flagged AS (
        |  SELECT user_id, tss, value,
        |    CASE WHEN tss - lag(tss) OVER (PARTITION BY user_id ORDER BY tss) <= INTERVAL 30 MINUTE
        |         THEN 0 ELSE 1 END AS new_sess
        |  FROM e),
        |numbered AS (
        |  SELECT user_id, tss, value,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY tss ROWS UNBOUNDED PRECEDING) AS sess_id
        |  FROM flagged)
        |SELECT user_id, min(tss) AS session_start,
        |  max(tss) + INTERVAL 30 MINUTE AS session_end,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM numbered GROUP BY user_id, sess_id
        |ORDER BY user_id, session_start""".stripMargin,

    // ---- sketch/approx quality-bound verdicts: the estimates are
    // engine-specific by design, but their documented error contracts
    // are not — each query computes BOTH the sketch and the exact
    // reference engine-side and returns literal bound verdicts the
    // oracle hash-matches, so the driver gate shows pass/fail ----
    "x_approx_distinct" ->
      """SELECT * FROM (VALUES ('orders_hll_err_lt_5pct', TRUE),
        |  ('parts_hll_err_lt_5pct', TRUE))
        |AS t(check_name, ok) ORDER BY check_name""".stripMargin,

    // the documented 100 TB profile configuration (exactDistinct=false):
    // HLL n_distinct within 10% of engine-side exact per column, every
    // other metric bit-identical between the two configurations
    "x_profile_approx" ->
      """SELECT * FROM (VALUES
        |  ('o_orderdate', TRUE, TRUE), ('o_orderkey', TRUE, TRUE),
        |  ('o_orderstatus', TRUE, TRUE), ('o_totalprice', TRUE, TRUE))
        |AS t("column", hll_err_lt_10pct, other_metrics_exact)
        |ORDER BY "column"""".stripMargin,

    "x_approx_quantiles" ->
      """SELECT i, CAST(p AS DOUBLE) AS p, ok FROM (VALUES
        |  (0, 0.25, TRUE), (1, 0.5, TRUE), (2, 0.75, TRUE), (3, 0.95, TRUE))
        |AS t(i, p, ok) ORDER BY i""".stripMargin,

    "x_active_trailing_hll" ->
      """SELECT * FROM (VALUES ('hll_day_sets_align', TRUE),
        |  ('hll_trailing_err_lt_5pct', TRUE))
        |AS t(check_name, ok) ORDER BY check_name""".stripMargin,

    "x_heavy_hitters_approx" ->
      """SELECT * FROM (VALUES ('all_heavy_keys_survive', TRUE),
        |  ('estimates_bracket_truth', TRUE), ('total_is_exact_count', TRUE))
        |AS t(check_name, ok) ORDER BY check_name""".stripMargin,

    "x_compression_ratio_check" ->
      """SELECT * FROM (VALUES ('ratio_bounds_structural', TRUE),
        |  ('ratio_orders_boiler_prose_noise', TRUE),
        |  ('ratio_partition_deterministic', TRUE))
        |AS t(check_name, ok) ORDER BY check_name""".stripMargin,

    "x_compression_ratio_hash" ->
      """SELECT * FROM (VALUES ('x_compression_ratio_content_hash_pinned', TRUE))
        |AS t(check_name, ok)""".stripMargin,

    // Benford replay: identical integer digit extraction, the same
    // ×10⁶ expectation literals, the same left-associated double shape
    "x_benford" ->
      """WITH digits AS (
        |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100.0) AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit
        |  FROM orders WHERE o_totalprice >= 0.01),
        |counts AS (SELECT digit, count(*) AS n FROM digits GROUP BY digit),
        |e AS (SELECT * FROM (VALUES (1, 301030), (2, 176091), (3, 124939),
        |  (4, 96910), (5, 79181), (6, 66947), (7, 57992), (8, 51153),
        |  (9, 45757)) AS t(digit, e6))
        |SELECT c.digit, c.n,
        |  CAST(c.n AS DOUBLE) / CAST(tt.n_total AS DOUBLE) AS obs_share,
        |  CAST(e6 AS DOUBLE) / 1000000.0 AS exp_share,
        |  ((CAST(c.n AS DOUBLE) - CAST(tt.n_total AS DOUBLE) * (CAST(e6 AS DOUBLE) / 1000000.0)) *
        |   (CAST(c.n AS DOUBLE) - CAST(tt.n_total AS DOUBLE) * (CAST(e6 AS DOUBLE) / 1000000.0))) /
        |  (CAST(tt.n_total AS DOUBLE) * (CAST(e6 AS DOUBLE) / 1000000.0)) AS chi2_term
        |FROM counts c JOIN e USING (digit)
        |CROSS JOIN (SELECT sum(n) AS n_total FROM counts) tt
        |ORDER BY digit""".stripMargin,

    // length-batch replay: same per-shard rank cut (floor of the same
    // double division) and integer batch stats
    "x_length_batches" ->
      """WITH r AS (
        |  SELECT source AS shard, doc_id AS id, CAST(n_chars AS BIGINT) AS len,
        |    CAST(floor((row_number() OVER (
        |      PARTITION BY source ORDER BY n_chars ASC, doc_id ASC) - 1) / 32)
        |      AS BIGINT) AS batch
        |  FROM documents)
        |SELECT shard, batch, count(*) AS n,
        |  CAST(min(len) AS BIGINT) AS min_len,
        |  CAST(max(len) AS BIGINT) AS max_len,
        |  CAST(sum(len) AS BIGINT) AS sum_len,
        |  1.0 - CAST(sum(len) AS DOUBLE) /
        |    CAST(count(*) * max(len) AS DOUBLE) AS pad_waste
        |FROM r GROUP BY shard, batch
        |ORDER BY shard, batch""".stripMargin,

    // Lorenz/Gini replay: same integer window sums over the per-source
    // frame, same two final double divisions
    "x_gini" ->
      """WITH pk AS (
        |  SELECT source AS key, CAST(sum(n_chars) AS BIGINT) AS mass
        |  FROM documents GROUP BY source),
        |r AS (
        |  SELECT key, mass,
        |    CAST(row_number() OVER (ORDER BY mass ASC, key ASC) AS INTEGER) AS rank,
        |    CAST(sum(mass) OVER (ORDER BY mass ASC, key ASC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_mass,
        |    CAST(count(*) OVER () AS BIGINT) AS n_keys,
        |    CAST(sum(mass) OVER () AS BIGINT) AS total
        |  FROM pk),
        |g AS (
        |  SELECT *, CAST(sum((2 * CAST(rank AS BIGINT) - n_keys - 1) * mass)
        |    OVER () AS BIGINT) AS gnum FROM r)
        |SELECT key, mass, rank, cum_mass,
        |  CAST(cum_mass AS DOUBLE) / CAST(total AS DOUBLE) AS cum_share,
        |  CAST(gnum AS DOUBLE) / (CAST(n_keys AS DOUBLE) * CAST(total AS DOUBLE)) AS gini
        |FROM g ORDER BY rank""".stripMargin,

    // diversity replay: same (group, label) cells, 12-dp -p ln p in
    // DECIMAL, entropy and exp rounded once
    "x_diversity" ->
      """WITH cells AS (
        |  SELECT source AS "group", lang AS label, CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY ALL),
        |tot AS (SELECT "group", sum(c) AS tot FROM cells GROUP BY "group"),
        |terms AS (
        |  SELECT cells."group", cells.c, tot.tot,
        |    round(-(CAST(c AS DOUBLE) / tot) * ln(CAST(c AS DOUBLE) / tot), 12) AS pterm
        |  FROM cells JOIN tot USING ("group")),
        |h AS (
        |  SELECT "group", CAST(max(tot) AS BIGINT) AS n_rows,
        |    CAST(count(*) AS BIGINT) AS n_labels,
        |    CAST(sum(CAST(pterm AS DECIMAL(28,12))) AS DOUBLE) AS hh
        |  FROM terms GROUP BY "group")
        |SELECT "group", n_rows, n_labels, round(hh, 6) AS entropy,
        |  round(exp(hh), 6) AS effective_labels
        |FROM h ORDER BY "group"""".stripMargin,

    "x_skew_report" ->
      """WITH c AS (
        |  SELECT CAST(l_suppkey AS VARCHAR) AS key, count(*) AS cnt
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT sum(cnt) AS total, count(*) AS nkeys FROM c),
        |r AS (
        |  SELECT key, cnt,
        |    CAST(row_number() OVER (ORDER BY cnt DESC, key) AS INTEGER) AS rank
        |  FROM c)
        |SELECT key, cnt, rank,
        |  round(CAST(cnt AS DOUBLE) / CAST(t.total AS DOUBLE), 6) AS share,
        |  round(CAST(cnt AS DOUBLE) / (CAST(t.total AS DOUBLE) / CAST(t.nkeys AS DOUBLE)), 6) AS skew
        |FROM r, t WHERE rank <= 10 ORDER BY rank""".stripMargin,

    // exact regime: err is identically 0 and counts are true counts
    "x_heavy_hitters" ->
      """WITH c AS (SELECT event_type AS key, count(*) AS n FROM events GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
        |SELECT c.key, c.n, CAST(0 AS BIGINT) AS err, t.total
        |FROM c, t ORDER BY c.n DESC, c.key""".stripMargin,

    // datasheet replay: same whitespace token count as x_text_stats,
    // same ⌈p·N⌉ discrete-rank percentile definition (ties on doc_id)
    "x_datasheet" ->
      """WITH tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(length(text)) AS BIGINT) AS n_chars,
        |    CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0
        |             ELSE len(string_split_regex(trim(text), '\s+')) END) AS BIGINT) AS n_tokens
        |  FROM documents),
        |corpus AS (
        |  SELECT 'corpus' AS section, 'n_docs' AS key, n_docs AS n,
        |    CAST(NULL AS DOUBLE) AS v FROM tot
        |  UNION ALL SELECT 'corpus', 'n_chars', n_chars, NULL FROM tot
        |  UNION ALL SELECT 'corpus', 'n_tokens_ws', n_tokens, NULL FROM tot),
        |langs AS (
        |  SELECT 'lang' AS section, lang AS key, CAST(count(*) AS BIGINT) AS n,
        |    round(CAST(count(*) AS DOUBLE) / (SELECT n_docs FROM tot), 6) AS v
        |  FROM documents GROUP BY lang),
        |sources AS (
        |  SELECT 'source' AS section, source AS key, CAST(count(*) AS BIGINT) AS n,
        |    round(CAST(count(*) AS DOUBLE) / (SELECT n_docs FROM tot), 6) AS v
        |  FROM documents GROUP BY source),
        |ranked AS (
        |  SELECT CAST(length(text) AS BIGINT) AS len,
        |    row_number() OVER (ORDER BY length(text) ASC, doc_id ASC) AS rk
        |  FROM documents),
        |pct AS (SELECT unnest([0.25, 0.5, 0.75, 0.95]) AS p,
        |        unnest(['p25', 'p50', 'p75', 'p95']) AS key),
        |lens AS (
        |  SELECT 'length_chars' AS section, pct.key AS key, r.len AS n,
        |    CAST(NULL AS DOUBLE) AS v
        |  FROM pct JOIN ranked r
        |    ON r.rk = CAST(ceil(pct.p * (SELECT n_docs FROM tot)) AS INTEGER))
        |SELECT * FROM corpus
        |UNION ALL SELECT * FROM langs
        |UNION ALL SELECT * FROM sources
        |UNION ALL SELECT * FROM lens
        |ORDER BY section, key""".stripMargin,
  )
}
