package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{Cleanse, Enrich, Flatten, Upsert}
import graft.ext.{Dedup, Similarity, TextOps}

/** Driver contract (SURVEY.md §2 operator inventory → runnable queries).
  *
  * Every query is deterministic: float aggregates accumulate exactly
  * (decimal) before a final cast to double, outputs carry a stable
  * ORDER BY, and column names match the DuckDB oracle exactly (the
  * driver sorts columns by name before hashing values).
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized
    * reader rejects — read ns as long and convert to micros ourselves.
    */
  private def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, dir, "events").withColumn("ts_us", expr("timestamp_micros(ts div 1000)"))
  }

  /** Exact sum of a 2-decimal double column: accumulate in decimal
    * (associative, order-independent — safe under any shuffle/partial-agg
    * order), then present as double. The DuckDB oracle does the same, so
    * results are bit-identical.
    */
  private def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")
  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** Nested "sessions" payload fixture for the Q22–Q27 per-site flatten
    * queries: orders = sessions, lineitem-derived children, nested with
    * [[Flatten.nestChild]] (the harness inverse, as in q17–q20). One
    * fixture carries ALL seven children so `Transform.sessions` runs
    * against the reference's full payload shape (Transform.py:166-297);
    * built once per (session, dir) and persisted because every child
    * query re-enters through it. Quarter sample — the nest construction
    * is the harness; the flatten under test is scale-invariant.
    */
  private val sessionsRawCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private def sessionsRaw(s: SparkSession, d: String): DataFrame =
    // keyed by applicationId (unique per SparkContext — identity hashes
    // can be reused after GC and would hand out a frame bound to a
    // stopped session)
    sessionsRawCache.computeIfAbsent(s"${s.sparkContext.applicationId}:$d", _ => {
      val base = t(s, d, "orders").filter(col("o_orderkey") % 4 === 0)
        .select(col("o_orderkey").as("id"), col("o_orderdate").as("start_dt"),
          col("o_custkey").as("agent_id"), col("o_totalprice").as("amount"))
      val li = t(s, d, "lineitem").filter(col("l_orderkey") % 4 === 0)

      // tags[].match[]: tag = distinct (order, part); match rows carry
      // tag_id AND tag_session_id (the collision field the call site
      // must drop). tk multiplier exceeds max partkey at test SFs.
      val matchRows = li.select(
        (col("l_orderkey") * 100000 + col("l_partkey")).as("tk"),
        col("l_partkey").as("tag_id"), col("l_orderkey").as("tag_session_id"),
        col("l_linenumber"), col("l_quantity"))
      val tagLevel = li.select(col("l_orderkey"), col("l_partkey").as("id")).distinct()
        .withColumn("tk", col("l_orderkey") * 100000 + col("id"))
      val tagsNested = Flatten.nestChild(tagLevel, matchRows, "tk", "tk", "match")
        .drop("tk")

      val cats = li.select(col("l_orderkey"), col("l_suppkey").as("id"), col("l_quantity"))
        .groupBy("l_orderkey", "id").agg(dsum(col("l_quantity")).as("score"))
      val revs = li.select(col("l_orderkey"), col("l_suppkey").as("id"), col("l_shipdate"))
        .groupBy("l_orderkey", "id").agg(max(col("l_shipdate")).as("last_reviewed_at"))

      // scores[].point_scores[]: score entry = distinct 3-key tuple; its
      // struct must CARRY session_id (the inner explode re-reads it), so
      // nest on a duplicated sess_key column
      val pointRows = li.select(
        (col("l_orderkey") * 35 + (col("l_partkey") % 5) * 7 + col("l_suppkey") % 7).as("sk"),
        col("l_linenumber").as("point_id"), col("l_quantity").as("value"))
      val scoreLevel = li.select(col("l_orderkey").as("session_id"),
          (col("l_partkey") % 5).as("scorecard_id"), (col("l_suppkey") % 7).as("reviewer_id"))
        .distinct()
        .withColumn("sk",
          col("session_id") * 35 + col("scorecard_id") * 7 + col("reviewer_id"))
      val scoresNested = Flatten.nestChild(scoreLevel, pointRows, "sk", "sk", "point_scores")
        .drop("sk").withColumn("sess_key", col("session_id"))

      val comments = li.select(col("l_orderkey"), col("l_suppkey").as("author_id"),
        concat(col("l_returnflag"), lit("-"), col("l_linestatus")).as("text"))
      val summaries = li.groupBy("l_orderkey").agg(max(col("l_returnflag")).as("text"))
      val crm = li.select(col("l_orderkey"), col("l_linestatus").as("crm_status")).distinct()

      var raw = Flatten.nestChild(base, tagsNested, "id", "l_orderkey", "tags")
      raw = Flatten.nestChild(raw, cats, "id", "l_orderkey", "categories")
      raw = Flatten.nestChild(raw, revs, "id", "l_orderkey", "reviewers")
      raw = Flatten.nestChild(raw, scoresNested, "id", "sess_key", "scores")
      raw = Flatten.nestChild(raw, comments, "id", "l_orderkey", "comments")
      raw = Flatten.nestChild(raw, summaries, "id", "l_orderkey", "summary")
      raw = Flatten.nestChild(raw, crm, "id", "l_orderkey", "crm_statuses")
      raw.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })

  /** Flagship (smoke-checked rows>0 on sf0.001): the "agent quality
    * dashboard" shape from SURVEY.md §7.2 — date-range scan, 5-table
    * star join (fact side never broadcast), monthly conditional rollup,
    * order+limit.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q30_star_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- §2.1 scans / sources ----
    "q01_scan_count" -> ((s, d) =>
      t(s, d, "lineitem").agg(count(lit(1)).as("cnt"))),

    "q02_halfday_scan" -> ((s, d) => {
      // half-day interval scan (utils.py:94-105): two adjacent windows
      val li = t(s, d, "lineitem")
      val w1 = li.filter(col("l_shipdate") >= lit("1995-03-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("1995-03-01 12:00:00").cast("timestamp"))
      val w2 = li.filter(col("l_shipdate") >= lit("1995-03-01 12:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("1995-03-02 00:00:00").cast("timestamp"))
      w1.union(w2).select("l_orderkey", "l_linenumber", "l_shipdate")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q03_filter_pushdown" -> ((s, d) =>
      t(s, d, "orders")
        .filter(col("o_orderstatus") === "F" &&
          col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
          col("o_totalprice") > 50000.0)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        .orderBy("o_orderkey")),

    "q04_count_filtered" -> ((s, d) =>
      t(s, d, "orders").filter(col("o_orderstatus") === "O")
        .agg(count(lit(1)).as("cnt"))),

    "q05_detail_join" -> ((s, d) => {
      // N+1 detail fetch → one left join against pre-aggregated details
      val o = t(s, d, "orders")
      val det = t(s, d, "lineitem").groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_lines"), dsum(col("l_quantity")).as("sum_qty"))
      o.join(det, o("o_orderkey") === det("l_orderkey"), "left")
        .select(col("o_orderkey"), col("o_totalprice"),
          coalesce(col("n_lines"), lit(0L)).as("n_lines"),
          coalesce(col("sum_qty"), lit(0.0)).as("sum_qty"))
        .orderBy("o_orderkey")
    }),

    "q06_semi_guard" -> ((s, d) => {
      // guarded detail fetch (Extract.py:87-94) = left-semi join
      val o = t(s, d, "orders")
      val r = t(s, d, "lineitem").filter(col("l_returnflag") === "R")
      o.join(r, o("o_orderkey") === r("l_orderkey"), "left_semi")
        .select("o_orderkey", "o_custkey", "o_orderstatus")
        .orderBy("o_orderkey")
    }),

    "q07_dim_scan" -> ((s, d) => {
      val n = t(s, d, "nation"); val r = t(s, d, "region")
      n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .select("n_nationkey", "n_name", "r_name").orderBy("n_nationkey")
    }),

    // ---- §2.2 projections / filters / row transforms ----
    "q08_projection_drop" -> ((s, d) =>
      Cleanse.strictDrop(t(s, d, "part"), Seq("p_type", "p_retailprice"))
        .orderBy("p_partkey")),

    "q09_select_reorder" -> ((s, d) =>
      t(s, d, "customer").select("c_mktsegment", "c_name", "c_custkey")
        .orderBy("c_custkey")),

    "q10_rename" -> ((s, d) =>
      t(s, d, "supplier")
        .withColumnRenamed("s_name", "supplier_name")
        .withColumnRenamed("s_acctbal", "balance")
        .select("s_suppkey", "supplier_name", "balance").orderBy("s_suppkey")),

    "q11_ts_filter" -> ((s, d) =>
      // watermark predicate (run-et-etl.py:99-100)
      t(s, d, "orders")
        .filter(col("o_orderdate") > lit("2000-06-01 00:00:00").cast("timestamp"))
        .select("o_orderkey", "o_orderdate").orderBy("o_orderkey")),

    "q12_in_subquery" -> ((s, d) => {
      val rich = t(s, d, "customer").filter(col("c_acctbal") > 9000.0).select("c_custkey")
      val o = t(s, d, "orders")
      o.join(broadcast(rich), o("o_custkey") === rich("c_custkey"), "left_semi")
        .select("o_orderkey", "o_custkey", "o_totalprice").orderBy("o_orderkey")
    }),

    "q13_cast" -> ((s, d) =>
      t(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_linenumber").cast("long").as("ln_big"),
        floor(col("l_quantity")).cast("int").as("qty_floor"))
        .orderBy("l_orderkey", "l_linenumber")),

    "q14_distinct" -> ((s, d) =>
      t(s, d, "lineitem").select("l_returnflag", "l_linestatus").distinct()
        .orderBy("l_returnflag", "l_linestatus")),

    "q15_default_row" -> ((s, d) => {
      // default-row injection (Transform.py:117-127)
      val r = t(s, d, "region").select("r_regionkey", "r_name")
      val default = s.range(1).select(
        lit(-1).cast("int").as("r_regionkey"), lit("UNASSIGNED").as("r_name"))
      Enrich.withDefaultRows(r, default, "r_regionkey").orderBy("r_regionkey")
    }),

    "q16_empty_shortcircuit" -> ((s, d) =>
      t(s, d, "orders").filter(col("o_totalprice") < 0.0).agg(count(lit(1)).as("cnt"))),

    // ---- §2.3 flatten (nest→explode roundtrips prove both directions) ----
    "q17_flatten_roundtrip" -> ((s, d) => {
      val o = t(s, d, "orders").select("o_orderkey")
      val li = t(s, d, "lineitem")
        .select("l_orderkey", "l_partkey", "l_linenumber", "l_quantity")
      val nested = Flatten.nestChild(o, li, "o_orderkey", "l_orderkey", "lines")
      Flatten.explodeChild(nested, "lines", Seq("o_orderkey" -> "l_orderkey"))
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
    }),

    "q18_flatten_prefix" -> ((s, d) => {
      // meta-carry + child-prefix (json_normalize meta_prefix, Transform.py:79-89)
      // half sample: nest construction is the test harness, not the operator
      val o = t(s, d, "orders").filter(col("o_orderkey") % 2 === 0)
        .select("o_orderkey", "o_orderdate")
      val li = t(s, d, "lineitem").filter(col("l_orderkey") % 2 === 0)
        .select("l_orderkey", "l_partkey", "l_linenumber")
      val nested = Flatten.nestChild(o, li, "o_orderkey", "l_orderkey", "items")
      Flatten.explodeChild(nested, "items",
          Seq("o_orderkey" -> "o_orderkey", "o_orderdate" -> "o_orderdate"),
          childPrefix = "li_")
        .orderBy("o_orderkey", "o_orderdate", "li_l_linenumber", "li_l_partkey")
    }),

    "q19_flatten_outer" -> ((s, d) => {
      // outer flatten: customers WITHOUT orders keep a null-order row
      // (LEFT-join semantics; inner explode would drop them)
      val c = t(s, d, "customer").select("c_custkey", "c_name")
      val o = t(s, d, "orders").filter(col("o_orderkey") % 4 === 0)
        .select("o_custkey", "o_orderkey", "o_totalprice")
      val nested = Flatten.nestChild(c, o, "c_custkey", "o_custkey", "ords")
      Flatten.explodeChildOuter(nested, "ords", Seq("c_custkey" -> "c_custkey"))
        .orderBy(col("c_custkey"), col("o_orderkey").asc_nulls_first)
    }),

    "q20_flatten_two_level" -> ((s, d) => {
      // two-level explode chain (sessions.scores[].point_scores[], Transform.py:205-218)
      // quarter sample: the nest construction (test-harness inverse of
      // flatten) is O(rows); the flatten under test is scale-invariant
      val c = t(s, d, "customer").select("c_custkey", "c_name")
      val o = t(s, d, "orders").filter(col("o_orderkey") % 4 === 0)
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val li = t(s, d, "lineitem").filter(col("l_orderkey") % 4 === 0)
        .select("l_orderkey", "l_linenumber", "l_quantity")
      val ordersNested = Flatten.nestChild(o, li, "o_orderkey", "l_orderkey", "lines")
      val customersNested = Flatten.nestChild(
        c, ordersNested, "c_custkey", "o_custkey", "orders")
      Flatten.explodeChild2(customersNested, "orders", "lines",
          parentKeys = Seq("c_custkey" -> "c_custkey"),
          childCarry = Seq("o_orderkey" -> "o_orderkey", "o_totalprice" -> "o_totalprice"))
        .orderBy("c_custkey", "o_orderkey", "o_totalprice", "l_linenumber", "l_quantity")
    }),

    // ---- §2.3b per-site flatten coverage: the remaining Transform call
    // sites (Q21–Q27), each through pipeline.Transform on a nested
    // fixture built from the driver tables (nestChild is the harness
    // inverse, as in q17–q20) ----
    "q21_tag_labels" -> ((s, d) => {
      // tags.labels (Transform.py:103-115): id→label_id rename under an
      // id→tag_id parent carry — the collision path a shared-operator
      // test can't catch
      val partBase = t(s, d, "part").select(col("p_partkey").as("id"),
        col("p_name").as("name"))
      val labels = t(s, d, "lineitem")
        .select(col("l_partkey"), col("l_suppkey").as("id")).distinct()
      val raw = Flatten.nestChild(partBase, labels, "id", "l_partkey", "labels")
      val (_, tagLabels) = graft.pipeline.Transform.tags(raw)
      tagLabels.get.orderBy("tag_id", "label_id")
    }),

    "q22_session_tags" -> ((s, d) =>
      graft.pipeline.Transform.sessions(sessionsRaw(s, d)).tags
        .orderBy("session_id", "tag_id", "l_linenumber", "l_quantity")),

    "q23_session_categories" -> ((s, d) =>
      graft.pipeline.Transform.sessions(sessionsRaw(s, d)).categories
        .orderBy("session_id", "category_id", "score")),

    "q24_session_reviewers" -> ((s, d) =>
      graft.pipeline.Transform.sessions(sessionsRaw(s, d)).reviewers
        .orderBy("session_id", "reviewer_id", "last_reviewed_at")),

    "q25_session_scores" -> ((s, d) =>
      // scores[].point_scores[] with the 3-key carry (Transform.py:205-218)
      graft.pipeline.Transform.sessions(sessionsRaw(s, d)).scores.get
        .orderBy("session_id", "scorecard_id", "reviewer_id", "point_id", "value")),

    "q26_session_comments" -> ((s, d) =>
      // comment_pos is dropped: the fixture nests via collect_list, so
      // array positions are arbitrary (the load-side last-wins dedup is
      // spec-tested on ordered JSON fixtures instead)
      graft.pipeline.Transform.sessions(sessionsRaw(s, d)).comments
        .select("session_id", "author_id", "text")
        .orderBy("session_id", "author_id", "text")),

    "q27_session_summary" -> ((s, d) =>
      graft.pipeline.Transform.sessions(sessionsRaw(s, d)).summaries
        .orderBy("session_id", "text")),

    "q27b_session_crm" -> ((s, d) =>
      graft.pipeline.Transform.sessions(sessionsRaw(s, d)).crmStatuses
        .orderBy("session_id", "crm_status")),

    // ---- §2.4 joins / enrichment ----
    "q28_broadcast_enrich" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val sup = t(s, d, "supplier"); val nat = t(s, d, "nation")
      Enrich.dimJoin(
          Enrich.dimJoin(li, sup, "l_suppkey", "s_suppkey",
            select = Seq("s_name" -> "s_name", "s_nationkey" -> "s_nationkey")),
          nat, "s_nationkey", "n_nationkey", select = Seq("n_name" -> "n_name"))
        .select("l_orderkey", "l_linenumber", "s_name", "n_name")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q29_left_join_detail" -> ((s, d) => {
      val o = t(s, d, "orders"); val c = t(s, d, "customer")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "left")
        .select(col("o_orderkey"), col("c_name"), col("c_mktsegment"))
        .orderBy("o_orderkey")
    }),

    "q30_star_agg" -> ((s, d) => {
      // flagship: 5-table star join + monthly revenue rollup (§7.2)
      val li = t(s, d, "lineitem")
      val o = t(s, d, "orders").filter(
        col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val c = t(s, d, "customer"); val n = t(s, d, "nation"); val r = t(s, d, "region")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"), date_trunc("month", col("o_orderdate")).as("month"))
        .agg(
          (sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount")))))
            .cast("double").as("revenue"),
          countDistinct(col("o_orderkey")).as("n_orders"))
        .orderBy("n_name", "month")
    }),

    // ---- §2.5 aggregations / sorts / set ops ----
    "q31_conditional_agg" -> ((s, d) =>
      // automated-vs-manual score split (schema.py:327) → conditional agg
      t(s, d, "orders").groupBy("o_custkey")
        .agg(
          sum(when(col("o_orderstatus") === "F", dec(col("o_totalprice")))
            .otherwise(lit(0).cast("decimal(18,2)"))).cast("double").as("sum_f"),
          sum(when(col("o_orderstatus") =!= "F", dec(col("o_totalprice")))
            .otherwise(lit(0).cast("decimal(18,2)"))).cast("double").as("sum_other"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_custkey")),

    "q32_ratio_rollup" -> ((s, d) =>
      // category-level score rollup shape: sum(score)/sum(max_score)
      t(s, d, "lineitem").groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_price"),
          count(lit(1)).as("n"))
        .withColumn("qty_per_price", col("sum_qty") / col("sum_price"))
        .orderBy("l_returnflag", "l_linestatus")),

    "q33_channel_agg" -> ((s, d) =>
      // channel-keyed aggregates (duration_details per channel)
      events(s, d).groupBy("event_type")
        .agg(dsum(col("value")).as("total_value"),
          count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("event_type")),

    "q34_topk" -> ((s, d) =>
      // TakeOrderedAndProject: top-k by aggregate
      t(s, d, "orders").groupBy("o_custkey")
        .agg(dsum(col("o_totalprice")).as("total_spent"))
        .orderBy(col("total_spent").desc, col("o_custkey").asc)
        .limit(10)),

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

    // ---- §2.6 scalar functions ----
    "q35_ts_round" -> ((s, d) => {
      // sub-second synth + round-to-second (pandas dt.round('s') analog)
      val li = t(s, d, "lineitem").filter(col("l_orderkey") < 500)
      val withMs = li.withColumn("ts_ms",
        expr("timestampadd(MILLISECOND, cast(pmod(l_orderkey * 7919 + l_linenumber, 86400000) as int), l_shipdate)"))
      withMs.select(col("l_orderkey"), col("l_linenumber"),
          Cleanse.tsRoundSec(col("ts_ms")).as("ts_rounded"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q36_sentinel_date" -> ((s, d) => {
      val o = t(s, d, "orders")
      val withStr = o.withColumn("dt_str",
        when(col("o_orderkey") % 100 === 0, lit("0001-01-01T00:00:00"))
          .otherwise(date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss")))
      withStr.select(col("o_orderkey"),
          Cleanse.sentinelDate(col("dt_str")).as("dt_clean"))
        .orderBy("o_orderkey")
    }),

    "q37_regex_salvage" -> ((s, d) => {
      val o = t(s, d, "orders")
      val withStr = o.withColumn("dt_str",
        when(col("o_orderkey") % 10 === 0,
          concat(lit("corrupted>>"), date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss"), lit("<<")))
          .otherwise(date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss")))
      withStr.select(col("o_orderkey"),
          Cleanse.tsParseSalvaged(col("dt_str")).as("dt_parsed"))
        .orderBy("o_orderkey")
    }),

    "q38_split_datetime" -> ((s, d) => {
      val o = t(s, d, "orders").withColumn("dt_str",
        date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss"))
      o.select(col("o_orderkey"),
          Cleanse.splitDate(col("dt_str")).as("d_date"),
          Cleanse.splitTimeHHMM(col("dt_str")).as("d_time"))
        .orderBy("o_orderkey")
    }),

    "q39_make_link" -> ((s, d) =>
      t(s, d, "orders").select(col("o_orderkey"),
          Cleanse.makeLink("https://app.example.com/main/conversations/view?session_id=",
            col("o_orderkey")).as("et_link"))
        .orderBy("o_orderkey")),

    "q40_json_extract" -> ((s, d) =>
      events(s, d).select(col("event_id"),
          Cleanse.jsonFieldInt(col("props"), "$.k").as("k_val"))
        .orderBy("event_id")),

    "q41_unicode_unescape" -> ((s, d) =>
      // escape sequences synthesized onto real text (the corpus itself
      // is backslash-free), so the decode path runs and the expected
      // output is exactly expressible in the oracle
      t(s, d, "documents").select(col("doc_id"),
          Cleanse.unicodeUnescape(
            concat(lit("\\u0041\\u00e9\\t"), col("text"))).as("unescaped"))
        .orderBy("doc_id")),

    "q42_nan_to_null" -> ((s, d) => {
      val li = t(s, d, "lineitem").withColumn("v",
        when(col("l_orderkey") % 7 === 0, lit(Double.NaN)).otherwise(col("l_tax")))
      li.select(col("l_orderkey"), col("l_linenumber"),
          Cleanse.nanToNull(col("v")).as("v_clean"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q43_date_arith" -> ((s, d) =>
      t(s, d, "orders").select(col("o_orderkey"),
          (col("o_orderdate") - expr("INTERVAL 1 DAY")).as("prev_day"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("day_str"))
        .orderBy("o_orderkey")),

    "q44_iso_format" -> ((s, d) =>
      t(s, d, "orders").select(col("o_orderkey"),
          Cleanse.isoFormat(col("o_orderdate")).as("iso_dt"))
        .orderBy("o_orderkey")),

    "q_url_codec" -> ((s, d) =>
      // URL form-encode + decode round-trip (Extract.py:37,46); p_name
      // is [a-z ] so the oracle can replicate the encoding exactly
      t(s, d, "part").select(col("p_partkey"),
          Cleanse.urlEncode(col("p_name")).as("enc"),
          Cleanse.urlDecode(Cleanse.urlEncode(col("p_name"))).as("roundtrip"))
        .orderBy("p_partkey")),

    // ---- §2.7 upsert / load ----
    "q45_upsert" -> ((s, d) => {
      val o = t(s, d, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
      val target = o.filter(col("o_orderkey") % 3 =!= 0)
      val updates = o.filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_orderstatus", lit("U"))
        .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
      Upsert.upsert(target, updates, Seq("o_orderkey")).orderBy("o_orderkey")
    }),

    "q46_upsert_dedup" -> ((s, d) => {
      // in-batch duplicate keys: last (highest seq) wins
      val o = t(s, d, "orders").select("o_orderkey", "o_totalprice")
      val v1 = o.filter(col("o_orderkey") % 4 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1.0).withColumn("seq", lit(1))
      val v2 = o.filter(col("o_orderkey") % 8 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 2.0).withColumn("seq", lit(2))
      val deduped = Upsert.dedupLastWins(v1.unionByName(v2), Seq("o_orderkey"), "seq")
      val target = o.filter(col("o_orderkey") % 3 === 0).withColumn("seq", lit(0))
      Upsert.upsert(target, deduped, Seq("o_orderkey"))
        .select("o_orderkey", "o_totalprice", "seq").orderBy("o_orderkey")
    }),

    "q47_schema_reconcile" -> ((s, d) => {
      // incoming frame has extra cols + misses one target col → project+report
      val incoming = t(s, d, "supplier").withColumn("junk", lit("x"))
      val rec = Upsert.reconcileSchema(incoming,
        targetCols = Seq("s_suppkey", "s_name", "s_acctbal", "not_present"),
        keys = Seq("s_suppkey"))
      rec.df.orderBy("s_suppkey")
    }),

    // ---- §2.8 incremental / temporal ----
    "q50_tumbling_agg" -> ((s, d) =>
      // tumbling calendar windows (daily cadence utils.py:60-79)
      t(s, d, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).as("w"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy("w")),

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

    "q_stream_paged" -> ((s, d) => {
      // STREAMING the paged connector end to end, oracle-gated: publish
      // the documents extract as a page dump through the connector's
      // WRITE path, tail it as a stream (page number = offset), parse
      // payloads per micro-batch into a parquet sink, read back — the
      // result must BE the documents table. Proves dump → stream →
      // typed rows with no loss, duplication, or half-read pages.
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      val tmp = java.nio.file.Files.createTempDirectory("graft-stream-paged").toString
      t(s, d, "documents").select("doc_id", "lang", "n_chars")
        .toJSON.toDF("payload").repartition(4)
        .write.format("graft-paged")
        .option("dir", s"$tmp/pages").option("prefix", "documents")
        .mode("append").save()
      val sch = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n_chars", org.apache.spark.sql.types.LongType)))
      val q = ss.readStream.format("graft-paged")
        .option("dir", s"$tmp/pages").option("prefix", "documents").load()
        .select(from_json(col("payload"), sch).as("r"))
        .select("r.doc_id", "r.lang", "r.n_chars")
        .writeStream.format("parquet")
        .option("path", s"$tmp/out")
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(s"$tmp/out").orderBy("doc_id")
    }),

    "q_stream_windowed_counts" -> ((s, d) => {
      // STREAMING execution of the tumbling-window incremental protocol
      // (Q50's streaming form): file-stream the orders table →
      // watermarked windowed counts → upsert sink per micro-batch →
      // read the merged table back. The oracle is plain batch SQL, so
      // this row proves stream results == batch results. value sums
      // accumulate in decimal (order-independent under any micro-batch
      // schedule).
      //
      // State partitions are sized to the STATEFUL KEY LOAD, not the
      // session's scan parallelism: each shuffle partition of a
      // stateful query carries a state-store instance (open, snapshot,
      // commit per micro-batch), so a handful of window×type keys on
      // 32 stores is pure per-store overhead. The stream runs on a
      // CLONED session (own conf, shared SparkContext) so the override
      // never touches the caller's session — Verify plans queries from
      // 4 threads concurrently, and a set/restore on the shared conf
      // would race. At production scale this is the
      // `spark.sql.shuffle.partitions` the STREAMING job is launched
      // with (sized to keys/throughput), independent of batch jobs.
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      val sch = t(s, d, "orders").schema
      val tmp = java.nio.file.Files.createTempDirectory("graft-stream").toString
      // the file source streams a DIRECTORY of drops — stage the table
      // file as one arriving drop
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$tmp/in"))
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$d/orders.parquet"),
        java.nio.file.Paths.get(s"$tmp/in/orders.parquet"))
      val stream = graft.streaming.StreamSync
        .readParquetStream(ss, s"$tmp/in", sch)
        .select(col("o_orderdate").cast("timestamp").as("ts"), // NTZ → event-time
          col("o_orderstatus").as("event_type"),
          col("o_totalprice").cast("decimal(18,2)").as("value"))
      val counts = graft.streaming.StreamSync.windowedCounts(stream, "ts", "1 day", "1 day")
      val out = counts.select(col("window.start").as("window_start"),
          col("event_type"), col("n"), col("total_value"))
        .withColumn("wyear", to_date(date_trunc("year", col("window_start"))))
      val q = graft.streaming.StreamSync.upsertSink(out, s"$tmp/table",
        keys = Seq("window_start", "event_type"), partitionCol = "wyear",
        checkpoint = s"$tmp/ckpt",
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q.awaitTermination()
      s.read.parquet(s"$tmp/table")
        .select(col("window_start"), col("event_type"), col("n"),
          col("total_value").cast("double").as("total_value"))
        .orderBy("window_start", "event_type")
    }),

    "q_stream_running_stats" -> ((s, d) => {
      // CUSTOM STREAMING STATE, driver-visible: transformWithState
      // (StatefulProcessor + RocksDB state store) keeping running
      // per-user stats — the arbitrary-state upgrade of Q50's windowed
      // protocol. One AvailableNow micro-batch means the emitted state
      // equals the batch aggregate, so the oracle is plain SQL; the
      // projection keeps only order-independent fields (count, max-ts)
      // — the double running sum is exercised in StreamSyncSpec.
      val sch = t(s, d, "orders").schema
      val tmp = java.nio.file.Files.createTempDirectory("graft-tws").toString
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$tmp/in"))
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$d/orders.parquet"),
        java.nio.file.Paths.get(s"$tmp/in/orders.parquet"))
      // cloned session (own conf, shared context): the RocksDB provider
      // and the state-partition override stay invisible to the caller's
      // session — Verify plans queries concurrently. State partitions
      // are sized to the stateful key THROUGHPUT: per-row encoder +
      // RocksDB work dominates this query (150k rows), so use more
      // stores than the windowed row's key-bound 8 — but still not the
      // scan parallelism.
      val ss = s.newSession()
      ss.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      ss.conf.set("spark.sql.shuffle.partitions", "16")
      locally {
        import ss.implicits._
        val stream = graft.streaming.StreamSync.readParquetStream(ss, s"$tmp/in", sch)
          .select(col("o_custkey").cast("long").as("userId"),
            col("o_orderdate").cast("timestamp").as("ts"),
            col("o_totalprice").cast("double").as("value"))
          .as[graft.streaming.StreamSync.UserEvent]
        val stats = graft.streaming.StreamSync.runningUserStats(stream)
        val q = stats.toDF().writeStream
          .outputMode("update")
          .option("checkpointLocation", s"$tmp/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (batch: DataFrame, _: Long) =>
            batch.write.mode("append").parquet(s"$tmp/out")
          }
          .start()
        q.awaitTermination()
      }
      s.read.parquet(s"$tmp/out")
        .select(col("userId").as("user_id"), col("nEvents").as("n_events"),
          col("lastSeen").as("last_seen"))
        .orderBy("user_id")
    }),

    "q_stream_dedup" -> ((s, d) => {
      // STREAMING EXACT DEDUP with bounded state: the input directory
      // receives the same orders drop TWICE (the at-least-once
      // re-delivery / backfill-replay shape) — dropDuplicatesWithin-
      // Watermark keeps one row per key and evicts state as the
      // watermark passes, so the output equals the batch distinct and
      // the oracle is plain SQL. Contrast: dropDuplicates would hold
      // every key forever.
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      val sch = t(s, d, "orders").schema
      val tmp = java.nio.file.Files.createTempDirectory("graft-sdedup").toString
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$tmp/in"))
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$d/orders.parquet"),
        java.nio.file.Paths.get(s"$tmp/in/orders_drop1.parquet"))
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$d/orders.parquet"),
        java.nio.file.Paths.get(s"$tmp/in/orders_drop2.parquet"))
      val stream = graft.streaming.StreamSync
        .readParquetStream(ss, s"$tmp/in", sch)
        .select(col("o_orderkey"),
          col("o_orderdate").cast("timestamp").as("ts"), // NTZ → event-time
          col("o_orderstatus"), col("o_totalprice"))
      val deduped = graft.streaming.StreamSync
        .dedupWithinWatermark(stream, "ts", "30 days", Seq("o_orderkey"))
      val q = deduped.writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          if (!batch.isEmpty) batch.write.mode("append").parquet(s"$tmp/out")
        }
        .start()
      q.awaitTermination()
      s.read.parquet(s"$tmp/out")
        .select(col("o_orderkey"), col("ts"), col("o_orderstatus"),
          col("o_totalprice"))
        .orderBy("o_orderkey")
    }),

    "q_stream_interval_join" -> ((s, d) => {
      // STREAM-STREAM INTERVAL JOIN, driver-visible: two order streams
      // (finished vs open) joined per customer within ±30 days — state
      // on both sides bounded by the watermark. One AvailableNow pass
      // over fully-arrived inputs emits every match, so the oracle is
      // the plain batch non-equi join.
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      val sch = t(s, d, "orders").schema
      val tmp = java.nio.file.Files.createTempDirectory("graft-ssj").toString
      for (sub <- Seq("f", "o")) {
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$tmp/$sub"))
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$d/orders.parquet"),
          java.nio.file.Paths.get(s"$tmp/$sub/orders.parquet"))
      }
      def side(sub: String, status: String, tsName: String, idName: String) =
        graft.streaming.StreamSync.readParquetStream(ss, s"$tmp/$sub", sch)
          .filter(col("o_orderstatus") === status)
          .select(col("o_custkey").as("user_id"),
            col("o_orderdate").cast("timestamp").as(tsName),
            col("o_orderkey").as(idName))
      val joined = graft.streaming.StreamSync.streamIntervalJoin(
        side("f", "F", "c_ts", "click_id"),
        side("o", "O", "v_ts", "view_id"),
        "user_id", "c_ts", "v_ts", tolerance = "30 days", lateness = "30 days")
      val q = joined.writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          if (!batch.isEmpty) batch.write.mode("append").parquet(s"$tmp/out")
        }
        .start()
      q.awaitTermination()
      s.read.parquet(s"$tmp/out")
        .select(col("user_id"), col("click_id"), col("view_id"))
        .orderBy("user_id", "click_id", "view_id")
    }),

    "q51_late_window_resync" -> ((s, d) =>
      // 30-day late-data re-extract with is_scored,manual analog filter
      t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("2001-07-01 00:00:00").cast("timestamp") &&
          col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderdate", "o_orderstatus")
        .orderBy("o_orderkey")),

    "q52_changed_dim_facts" -> ((s, d) => {
      // dimension-driven fact invalidation (run-et-etl.py:95-106)
      val changedDims = t(s, d, "customer").filter(col("c_nationkey").isin(1, 2, 3))
      val o = t(s, d, "orders")
      o.join(broadcast(changedDims.select(col("c_custkey"))),
          o("o_custkey") === col("c_custkey"), "left_semi")
        .select("o_orderkey", "o_custkey").orderBy("o_orderkey")
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
      // exact ROC AUC of value as a purchase predictor — Mann-Whitney
      // over DISTINCT-score groups (the window never sees row volume),
      // integral until one final division
      graft.ext.Eval.auc(
        events(s, d).select((col("event_type") === "purchase").as("y"),
          col("value")),
        "y", "value")),

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
      // 4/6-dp decimals before accumulation.
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum((dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
            .cast("decimal(30,4)")).cast("double").as("sum_disc_price"),
          sum((dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount")))
            * (lit(1).cast("decimal(18,2)") + dec(col("l_tax")))).cast("decimal(30,6)"))
            .cast("double").as("sum_charge"),
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

    "q_unpivot" -> ((s, d) =>
      // wide→long melt of the lineitem measures (the inverse of
      // q_pivot): Spark's Unpivot node — a zero-shuffle Expand
      t(s, d, "lineitem")
        .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "metric", "value")
        .orderBy("l_orderkey", "l_linenumber", "metric", "value")),

    "x_split" -> ((s, d) =>
      // deterministic train/val/test assignment (growth-stable FNV
      // membership, seed 13), summarized per split × lang
      graft.ext.Corpus.assignSplit(t(s, d, "documents"), "doc_id")
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
        .orderBy("split", "lang")),

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

    "q_pagerank" -> ((s, d) => {
      // entity importance over the purchase FK graph: customers link to
      // the suppliers they bought from (bipartite, suppliers dangling —
      // exercises the dangling-mass correction). 3 synchronous steps;
      // per-edge contributions accumulate in decimal, so the unrolled
      // oracle matches byte-for-byte.
      val e = t(s, d, "orders")
        .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
        .distinct()
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
          expr("ts div 1000000000").as("es"), col("value")),
        "event_type", "es", "value", 3600L)
        .orderBy("event_type", "slot")),

    "q_ts_anomaly" -> ((s, d) => {
      // rolling anomaly flags over the hourly grid: each slot scored
      // against the trailing day's mean/std (exclusive window, so a
      // spike can't inflate its own baseline)
      val rs = graft.ops.TimeSeries.resample(
        events(s, d).select(col("event_type"),
          expr("ts div 1000000000").as("es"), col("value")),
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
          expr("ts div 1000000000").as("es"), col("value")),
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

    // ---- ext: dedup ----
    "x_dedup_exact" -> ((s, d) =>
      Dedup.exact(t(s, d, "documents"), "text", "doc_id")
        .select("doc_id", "lang", "n_chars").orderBy("doc_id")),

    "x_dedup_exact_best" -> ((s, d) =>
      // quality-first representative: keep the LONGEST duplicate (by
      // n_chars), ties to min doc_id
      Dedup.exactKeepBest(t(s, d, "documents"), "text", "doc_id", "n_chars")
        .select("doc_id", "lang", "n_chars").orderBy("doc_id")),

    "x_dedup_jaccard" -> ((s, d) =>
      Dedup.jaccardPairs(
          t(s, d, "documents").filter(col("doc_id") < 300),
          "text", "doc_id", shingleSize = 3, threshold = 0.5)
        .orderBy("id_a", "id_b")),

    "x_dedup_clusters" -> ((s, d) => {
      // near-dup CLUSTER resolution: pairs (n-gram jaccard) → connected
      // components (min-label propagation) → per-doc cluster id + size.
      // The step that turns pairwise similarity into deduplicatable
      // groups (transitive: A~B, B~C clusters A,B,C together even when
      // A≁C). The oracle replays it with a recursive CTE.
      val docs = t(s, d, "documents").filter(col("doc_id") < 300)
      val pairs = Dedup.jaccardPairs(docs, "text", "doc_id",
        shingleSize = 3, threshold = 0.5)
      val cc = Dedup.connectedComponents(
        pairs.select("id_a", "id_b"), docs.select("doc_id"))
      import org.apache.spark.sql.expressions.Window
      cc.select(col("id").as("doc_id"), col("cluster_id"))
        .withColumn("cluster_size",
          count(lit(1)).over(Window.partitionBy(col("cluster_id"))))
        .orderBy("doc_id")
    }),

    "x_dedup_minhash" -> ((s, d) =>
      // portable FNV-1a signatures — the oracle replays the FULL LSH
      // pipeline (signatures, banding, bucket join, est_jaccard)
      Dedup.minhashNearDups(
          t(s, d, "documents").filter(col("doc_id") < 300),
          "text", "doc_id", shingleSize = 3, k = 64, bands = 16, threshold = 0.5)
        .orderBy("id_a", "id_b")),

    "x_dedup_incremental" -> ((s, d) => {
      // cross-run near-dedup: an incoming batch (doc_id 200–299)
      // LSH-joined against the existing corpus store (doc_id < 200) —
      // the daily-ingest shape; no store self-join
      val docs = t(s, d, "documents")
      Dedup.minhashNearDupsAgainst(
          docs.filter(col("doc_id") >= 200 && col("doc_id") < 300),
          docs.filter(col("doc_id") < 200),
          "text", "doc_id", shingleSize = 3, k = 64, bands = 16, threshold = 0.5)
        .orderBy("id_new", "id_store")
    }),

    "x_dedup_simhash" -> ((s, d) =>
      // rotations=8 × prefixBits=8 = 8 disjoint blocks → EXACT for
      // hamming ≤ 7 (pigeonhole), so the oracle is brute-force all-pairs
      Dedup.simhashNearDups(
          t(s, d, "documents").filter(col("doc_id") < 300),
          "text", "doc_id", shingleSize = 3, maxHamming = 7, prefixBits = 8,
          rotations = 8)
        .orderBy("id_a", "id_b")),

    "x_fingerprint" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")),

    "x_bm25_search" -> ((s, d) =>
      // BM25 relevance ranking for a bag-of-terms query — corpus
      // slicing by keyword relevance; fixed-order score assembly keeps
      // the float sum deterministic (see Search.bm25)
      graft.ext.Search.bm25(t(s, d, "documents"), "text", "doc_id",
          Seq("spark", "vector", "merge"), topK = 20)
        .select(col("id").as("doc_id"), col("score"), col("rank"))
        .orderBy("rank")),

    // ---- ext: similarity search ----
    "x_ann_bruteforce" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 5),
          "embedding", "vec_id", k = 10)
        .orderBy("query_id", "rank")
    }),

    "x_bigram_lp" -> ((s, d) =>
      // corpus-self-trained bigram predictability score (exact KenLM-
      // style quality cut) — boilerplate scores high, noise low
      graft.ext.TextOps.bigramLogProb(t(s, d, "documents"), "text", "doc_id")
        .orderBy("id")),

    "x_chunks" -> ((s, d) =>
      // context-window chunking (40 tokens, 10 overlap — sized so the
      // synthetic 10-99-token docs split into 1-3 chunks): shuffle-free
      // explode+slice; chunks ship as portable FNV hashes so the
      // oracle can audit exact boundaries without dumping text
      graft.ext.TextOps.chunkTokens(t(s, d, "documents"), "text", "doc_id",
          chunkTokens = 40, overlap = 10)
        .select(col("doc_id"), col("chunk_id"), col("n_tok"),
          graft.functions.VectorExpressions.fnv1a64(col("chunk_text")).as("chunk_fnv"))
        .orderBy("doc_id", "chunk_id")),

    "x_kmeans" -> ((s, d) => {
      // auditable clustering: one FNV-seeded Lloyd step over the
      // embedding corpus (k=8), summarized as per-cluster size + mean
      // cosine-to-centroid. Every step — seeding hash, decimal-exact
      // centroid means, kernel accumulation order, tie-break — replays
      // in the DuckDB oracle byte-for-byte (unlike the xxhash-seeded
      // IVF rows, which are rows-only by design).
      val e = t(s, d, "embeddings")
      Similarity.kmeansAssign(e, "embedding", "vec_id", k = 8)
        .groupBy("cell")
        .agg(count(lit(1)).as("n"),
          round(sum(col("cos").cast("decimal(18,6)")).cast("double") / count(lit(1)), 6).as("avg_cos"))
        .orderBy("cell")
    }),

    "x_ann_ivf" -> ((s, d) => {
      // rows-only: approximate (IVF probe) — no exact oracle by design
      val e = t(s, d, "embeddings")
      val centroids = Similarity.materializeCentroids(
        Similarity.coarseCentroids(e, "embedding", "vec_id", nCells = 16))
      val assigned = Similarity.assignCells(e, centroids, "embedding", "vec_id")
      Similarity.ivfTopK(assigned, centroids, e.filter(col("vec_id") < 5),
          "embedding", "vec_id", k = 10, nProbe = 4)
        .orderBy("query_id", "rank")
    }),

    "x_ann_ivf_recall" -> ((s, d) => {
      // ORACLE-GATED quality bound for the approximate ANN paths: mean
      // recall@10 vs the exact brute force, computed ENGINE-side for
      // both the IVF probe path and the FAISS-style IVF-PQ residual
      // path (deterministic: hash-seeded centroids, deterministic
      // ties), returned as literal bound verdicts the driver can gate
      // on. The synthetic embeddings are near-UNIFORM — ANN's worst
      // case, where top-10 neighbors scatter across cells — so the
      // bounds are what these probe budgets actually deliver on that
      // data family, measured at sf0.001/0.01/0.1 with margin:
      // IVF nProbe=8/16 → 0.78–0.80 (bound 0.70); IVF-PQ nProbe=12,
      // shortlist=200 → 0.72–0.93 (bound 0.65). On clustered real
      // corpora the same configs clear 0.9 (SimilaritySpec/PqSpec).
      val e = t(s, d, "embeddings")
      val q = e.filter(col("vec_id") < 20)
      val cents = Similarity.refineCentroids(e,
        Similarity.coarseCentroids(e, "embedding", "vec_id", nCells = 16),
        "embedding", "vec_id", iterations = 1)
      val assigned = Similarity.assignCells(e, cents, "embedding", "vec_id")
      val ivf = Similarity.ivfTopK(assigned, cents, q, "embedding", "vec_id",
        k = 10, nProbe = 8)
      val brute = Similarity.bruteForceTopK(e, q, "embedding", "vec_id", k = 10)
      val ivfOk = Similarity.recallAtK(ivf, brute)
        .agg((avg(col("recall")) >= 0.7).as("ok"))
        .select(lit("ivf_mean_recall10_ge_070").as("check_name"), col("ok"))
      // IVF-PQ on normalized vectors, same residual index as x_ann_ivfpq
      val en = e.select(col("vec_id").as("id"),
        graft.ext.Pq.normalized(col("embedding")).as("v"))
      val qn = en.filter(col("id") < 20)
      val centsN = Similarity.refineCentroids(en,
        Similarity.coarseCentroids(en, "v", "id", nCells = 16),
        "v", "id", iterations = 1)
      val (rcb, enc) = graft.ext.Pq.ivfPqIndex(en, centsN, "v", "id",
        dim = 64, m = 8, ksub = 16, iterations = 1)
      val ivfpq = graft.ext.Pq.ivfPqRerankTopK(enc, centsN, rcb, qn, en,
        "v", "id", k = 10, shortlistK = 200, nProbe = 12,
        dim = 64, m = 8, ksub = 16)
      val bruteN = Similarity.bruteForceTopK(en, qn, "v", "id", k = 10)
      val ivfpqOk = Similarity.recallAtK(ivfpq, bruteN)
        .agg((avg(col("recall")) >= 0.65).as("ok"))
        .select(lit("ivfpq_mean_recall10_ge_065").as("check_name"), col("ok"))
      ivfOk.unionByName(ivfpqOk).orderBy("check_name")
    }),

    "x_embed_neardup" -> ((s, d) =>
      Dedup.embeddingNearDups(
          t(s, d, "embeddings").filter(col("vec_id") < 300),
          "embedding", "vec_id", threshold = 0.4)
        .orderBy("id_a", "id_b")),

    "x_embed_neardup_incr" -> ((s, d) => {
      // ORACLE-GATED quality verdict for the incremental path: an
      // incoming embedding batch (vec_id ≥ 400) probed against the
      // corpus store (vec_id < 400). The exact batch×store pair set is
      // recomputed engine-side on a bounded slice (store capped by
      // construction, batch capped at 300 ids) and the IVF-probed pairs
      // must reach 90% recall with zero false positives on that slice
      val e = t(s, d, "embeddings")
      val batch = e.filter(col("vec_id") >= 400 && col("vec_id") < 700)
      val store = e.filter(col("vec_id") < 400)
      val got = Dedup.embeddingNearDupsAgainst(
          batch, store, "embedding", "vec_id",
          threshold = 0.4, nCells = 16, nProbe = 10)
        .select(col("id_new"), col("id_store"))
      // exact pairs: broadcast the bounded store side, verify with the
      // same codegen cosine — a BNL join over ≤400 stored vectors
      val exact = batch.select(col("vec_id").as("id_new"), col("embedding").as("vn"))
        .crossJoin(broadcast(
          store.select(col("vec_id").as("id_store"), col("embedding").as("vs"))))
        .filter(graft.functions.VectorExpressions.cosineF(col("vn"), col("vs")) >= 0.4)
        .select(col("id_new"), col("id_store"))
      val nExact = exact.agg(count(lit(1)).as("n_exact"))
      val nGot = got.agg(count(lit(1)).as("n_got"))
      val nInter = got.join(exact, Seq("id_new", "id_store")).agg(count(lit(1)).as("n_inter"))
      nInter.crossJoin(broadcast(nExact)).crossJoin(broadcast(nGot))
        .select(explode(array(
          struct(lit("incr_recall_ge_090").as("check_name"),
            (col("n_inter").cast("double") / col("n_exact") >= 0.9).as("ok")),
          struct(lit("incr_no_false_positives").as("check_name"),
            (col("n_inter") === col("n_got")).as("ok")))).as("c"))
        .select(col("c.check_name").as("check_name"), col("c.ok").as("ok"))
        .orderBy("check_name")
    }),

    "x_embed_neardup_bucketed" -> ((s, d) => {
      // ORACLE-GATED quality verdict for the bucketed near-dup path:
      // runs the FULL embeddings table (no cap) through IVF cell
      // bucketing, then grades the found pairs on a bounded slice
      // (both ids < 300) against the exact all-pairs operator — 90%
      // recall, zero false positives (the exact-verify stage makes
      // precision 1.0 by construction; the verdict proves it)
      val e = t(s, d, "embeddings")
      val got = Dedup.embeddingNearDupsBucketed(
          e, "embedding", "vec_id", threshold = 0.4, nCells = 16, nProbe = 4)
        .filter(col("id_a") < 300 && col("id_b") < 300)
        .select(col("id_a"), col("id_b"))
      val exact = Dedup.embeddingNearDups(
          e.filter(col("vec_id") < 300), "embedding", "vec_id", threshold = 0.4)
        .select(col("id_a"), col("id_b"))
      val nExact = exact.agg(count(lit(1)).as("n_exact"))
      val nGot = got.agg(count(lit(1)).as("n_got"))
      val nInter = got.join(exact, Seq("id_a", "id_b")).agg(count(lit(1)).as("n_inter"))
      nInter.crossJoin(broadcast(nExact)).crossJoin(broadcast(nGot))
        .select(explode(array(
          struct(lit("bucketed_recall_ge_090").as("check_name"),
            (col("n_inter").cast("double") / col("n_exact") >= 0.9).as("ok")),
          struct(lit("bucketed_no_false_positives").as("check_name"),
            (col("n_inter") === col("n_got")).as("ok")))).as("c"))
        .select(col("c.check_name").as("check_name"), col("c.ok").as("ok"))
        .orderBy("check_name")
    }),

    // ---- ext: text analysis ----
    "x_text_stats" -> ((s, d) =>
      t(s, d, "documents").select(
          col("doc_id"),
          TextOps.tokenCountWs(col("text")).as("n_tokens"),
          TextOps.charCount(col("text")).as("n_chars_m"),
          round(TextOps.alphaRatio(col("text")), 6).as("alpha_ratio"))
        .orderBy("doc_id")),

    "x_langid" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"), col("lang"),
          TextOps.langIdGuess(col("text")).as("lang_guess"))
        .orderBy("doc_id")),

    "x_quality" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
          TextOps.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")),

    "x_repetition" -> ((s, d) =>
      // Gopher-style repetition filters: top-token / top-bigram /
      // duplicate-bigram fractions per doc
      TextOps.repetitionStats(t(s, d, "documents"), "text", "doc_id", n = 2)
        .select(col("id").as("doc_id"), col("top_token_frac"),
          col("top_ngram_frac"), col("dup_ngram_frac"))
        .orderBy("doc_id")),

    "x_pii_redact" -> ((s, d) =>
      // PII scrub over text with synthesized (deterministic) email /
      // phone / IPv4 — both sides inject the same PII, so the redaction
      // semantics are fully oracle-checked (same recipe as q41's
      // synthesized escapes)
      t(s, d, "documents")
        .withColumn("dirty", concat(col("text"),
          lit(" contact user"), col("doc_id"), lit("@example.com or +1 555 01"),
          col("doc_id"), lit(" at 10.0."), pmod(col("doc_id"), lit(256)), lit(".7")))
        .select(col("doc_id"), TextOps.redactPii(col("dirty")).as("clean"))
        .orderBy("doc_id")),

    "x_bpe_tokens" -> ((s, d) =>
      // the lookaround boundary-split equals maximal-run extraction on
      // ASCII text, which the oracle can express without lookarounds
      t(s, d, "documents").select(col("doc_id"),
          TextOps.tokenCountBpeIsh(col("text")).as("n_bpe_ish"))
        .orderBy("doc_id")),

    "x_decontaminate" -> ((s, d) => {
      // n-gram benchmark decontamination: docs sharing any 5-gram with
      // the "benchmark" slice (doc_id < 20) are removed
      val docs = t(s, d, "documents")
      graft.ext.Corpus.decontaminate(docs, docs.filter(col("doc_id") < 20),
          "text", "doc_id", n = 5)
        .select("doc_id", "lang").orderBy("doc_id")
    }),

    "x_curation_e2e" -> ((s, d) => {
      // the COMPOSED curation pipeline: quality gate → benchmark
      // decontamination → exact dedup → near-dup cluster dedup. Every
      // stage is individually oracle-proven; this row verifies the
      // stage WIRING end-to-end against one composed DuckDB replay.
      val docs = t(s, d, "documents")
      graft.ext.CurationPipeline.curate(docs, docs.filter(col("doc_id") < 20),
          "text", "doc_id", minQuality = 0.5, ngram = 5,
          shingleSize = 3, jaccardThreshold = 0.5)
        .select("doc_id", "lang").orderBy("doc_id")
    }),

    "x_sample_stratified" -> ((s, d) =>
      // portable FNV sample buckets — the oracle replays the exact
      // per-row membership decision
      graft.ext.Corpus.stratifiedSample(t(s, d, "documents"),
          "doc_id", "lang", Map("en" -> 0.5, "de" -> 0.25), seed = 7L)
        .select("doc_id", "lang").orderBy("doc_id")),

    "x_mixture_budget" -> ((s, d) =>
      // token-budget mixture assembly: en capped at 5000 tokens, de at
      // 2000, other strata dropped — deterministic hash order, so the
      // oracle replays the exact cutoff
      graft.ext.Corpus.tokenBudgetSample(t(s, d, "documents"), "doc_id", "lang",
          TextOps.tokenCountWs(col("text")), Map("en" -> 5000L, "de" -> 2000L),
          seed = 7L)
        .select("doc_id", "lang").orderBy("doc_id")),

    "x_pack_offsets" -> ((s, d) =>
      // sequence-packing layout: deterministic concatenation order +
      // token offsets + 2048-token bin per doc, in 8 parallel buckets
      graft.ext.Corpus.packingOffsets(t(s, d, "documents"), "doc_id",
          TextOps.tokenCountWs(col("text")), binTokens = 2048, nBuckets = 8,
          seed = 7L)
        .select(col("doc_id"), col("pack_bucket"), col("pack_offset"), col("bin_id"))
        .orderBy("doc_id")),

    "x_multimodal_frames" -> ((s, d) => {
      // ORACLE-GATED frame sampling over REAL decoded stills (each doc's
      // blob is a deterministic executor-rendered PNG; the JDK has no
      // video codec, so the frame GRAB is the one remaining stub). The
      // oracle replays the row-per-frame shape, offsets, and zero-
      // duration inner semantics; the decoded feature rides along as a
      // range verdict (profile ∈ [0,1] + normalized shift ∈ [0,1))
      val render = udf((id: Long) => graft.ext.Multimodal.renderPng(id))
      val blobs = t(s, d, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id"), render(col("doc_id")).as("blob"),
          (col("n_chars") % 5 * 1000).cast("long").as("duration_ms"))
      graft.ext.Multimodal.sampleFrames(blobs, "blob", "duration_ms",
          everyMs = 1000, dim = 4)
        .select(col("doc_id"), col("duration_ms"), col("frame_ms"),
          (element_at(col("frame_feature"), 1) >= 0 &&
            element_at(col("frame_feature"), 1) < 2).as("f0_ok"))
        .orderBy("doc_id", "frame_ms")
    }),

    "x_multimodal_neardup" -> ((s, d) => {
      // ORACLE-GATED perceptual near-dup over REAL images: javax.imageio
      // decode + true dHash through the shared Charikar banding in its
      // pigeonhole-EXACT regime (rotations=8 × prefixBits=8 finds every
      // pair within hamming ≤ 4 deterministically). Every 7th doc gets a
      // planted 2-pixel-noised twin (≤ 4 flipped bits), and distinct
      // mosaic seeds sit ~32 bits apart — so the found pairs are EXACTLY
      // the planted ones, which the oracle enumerates in SQL
      val render = udf((id: Long) => graft.ext.Multimodal.renderPng(id))
      val renderNoisy = udf((id: Long) =>
        graft.ext.Multimodal.renderPng(id, noisePixels = 2))
      val docs = t(s, d, "documents").filter(col("doc_id") < 2000)
      val base = docs.select(col("doc_id"), render(col("doc_id")).as("blob"))
      val twins = docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"),
          renderNoisy(col("doc_id")).as("blob"))
      graft.ext.Multimodal.imageNearDups(base.unionByName(twins), "blob", "doc_id",
          maxHamming = 4, prefixBits = 8, rotations = 8)
        .select("id_a", "id_b")
        .orderBy("id_a", "id_b")
    }),

    "x_multimodal_features" -> ((s, d) => {
      // ORACLE-GATED: REAL javax.imageio decode over executor-rendered
      // PNG blobs — media_kind/width/height only come out 'image'/32/32
      // if the codec actually decoded every blob, which is exactly what
      // the oracle asserts row by row (the luminance profile itself is
      // verified by x_multimodal_selfcheck's independent replay)
      val render = udf((id: Long) => graft.ext.Multimodal.renderPng(id))
      val blobs = t(s, d, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"), render(col("doc_id")).as("blob"))
      graft.ext.Multimodal.extractFeatures(blobs, "blob", dim = 8)
        .select(col("doc_id"), col("media_kind"), col("width"), col("height"))
        .orderBy("doc_id")
    }),

    "x_multimodal_selfcheck" -> ((s, d) =>
      // ORACLE-GATED media-kernel verdicts: decode dims, independent
      // feature replay, dHash locality, resize round-trip, WAV decode,
      // planted-twin near-dup recall — each boolean computed ON the
      // engine over executor-rendered fixtures; the oracle hash-matches
      // the literal expected verdicts, so the driver gate sees pass/fail
      graft.ext.Multimodal.selfCheck(
        t(s, d, "documents").filter(col("doc_id") < 50), "doc_id")),

    "x_keyterms" -> ((s, d) =>
      // per-doc top-3 distinctive terms by smoothed TF-IDF — the
      // document-labeling complement of x_bm25_search; df computed as a
      // window over the tf frame (explode runs once — see Search.bm25)
      graft.ext.Search.keyTerms(t(s, d, "documents"), "text", "doc_id", topK = 3)
        .select(col("id").as("doc_id"), col("term"), col("score"), col("rank"))
        .orderBy("doc_id", "rank")),

    "x_unigram_logprob" -> ((s, d) =>
      // model-free LM quality signal: per-doc mean unigram log-prob
      // under the corpus' own distribution (decimal-accumulated ln —
      // deterministic at any parallelism)
      graft.ext.Corpus.unigramLogProb(t(s, d, "documents"), "text", "doc_id")
        .orderBy("id")),

    "x_gopher_filter" -> ((s, d) =>
      // composite Gopher quality verdict (Rae et al. 2021 Table A1):
      // per-rule metrics + all-rules pass flag, all codegen'd column
      // arithmetic — the inline quality cut of a pre-training ingest
      TextOps.gopherFilter(t(s, d, "documents"), "text", "doc_id")
        .orderBy("doc_id")),

    "x_vocab_topk" -> ((s, d) =>
      // corpus vocabulary: top-100 words with rank + cumulative
      // coverage — tokenizer-training prep; ties rank by word
      graft.ext.Corpus.vocabulary(t(s, d, "documents"), "text", topK = 100)
        .orderBy("rank")),

    "x_dup_passages" -> ((s, d) =>
      // cross-doc duplicate-passage profile: per doc, how many of its
      // 5-token windows appear in other docs (inverted-index shape —
      // no pair join); the oracle replays it over shingle strings
      Dedup.duplicatePassages(t(s, d, "documents"), "text", "doc_id", n = 5)
        .orderBy("id")),

    "x_dup_passages_removed" -> ((s, d) =>
      // the passage-dedup TREATMENT: docs rewritten with every token
      // inside a cross-doc 5-token window removed — whole-doc dedup
      // can't do this (the boilerplate hides inside unique pages)
      Dedup.removeDuplicatePassages(t(s, d, "documents"), "text", "doc_id", n = 5)
        .orderBy("id")),

    "x_dup_passages_incr" -> ((s, d) => {
      // cross-run passage profiling: an incoming batch (doc_id 200–299)
      // scored against the corpus window store (doc_id < 200) — the
      // daily-ingest shape; the corpus text is never re-scanned
      val docs = t(s, d, "documents")
      val store = Dedup.windowStore(
        docs.filter(col("doc_id") < 200), "text", "doc_id", n = 5)
      Dedup.duplicatePassagesAgainst(
          docs.filter(col("doc_id") >= 200 && col("doc_id") < 300),
          store, "text", "doc_id", n = 5)
        .orderBy("id")
    }),

    "x_zorder_layout" -> ((s, d) =>
      // Morton z-value over (custkey, days-since-epoch) — the write-
      // time clustering key for two-dimensional data skipping; pure
      // bit arithmetic, replayed bit-for-bit by the oracle
      t(s, d, "orders").select(col("o_orderkey"),
          graft.ops.Layout.zValue(col("o_custkey"),
            datediff(col("o_orderdate"), lit("1992-01-01").cast("date")))
            .as("zval"))
        .orderBy("o_orderkey")),

    "x_skew_report" -> ((s, d) =>
      // join-key skew diagnostic over the fact table's supplier key —
      // the pre-salting inspection; deterministic tie order
      graft.ops.Validate.skewReport(t(s, d, "lineitem"), "l_suppkey", topK = 10)
        .orderBy("rank")),

    "x_zorder3" -> ((s, d) => {
      // three-dimensional Morton code (custkey, day index, priority
      // class) — the clustering key for a fact queried by key AND date
      // AND category; bit i of column k lands at position 3i+k
      val day = datediff(col("o_orderdate"), lit("1992-01-01").cast("date"))
      val pri = substring(col("o_orderpriority"), 1, 1).cast("long")
      t(s, d, "orders").select(col("o_orderkey"),
          graft.ops.Layout.zValueN(
            Seq(col("o_custkey"), day, pri), bits = 16).as("zval"))
        .orderBy("o_orderkey")
    }),

    "x_zrange_scan" -> ((s, d) => {
      // read-side z-probe: a (custkey, day) box answered through the
      // quadtree z-range cover + residual predicate — must equal the
      // plain box filter (the oracle IS the plain box filter); on a
      // z-sorted table each range is one contiguous scan
      val day = datediff(col("o_orderdate"), lit("1992-01-01").cast("date"))
      val o = t(s, d, "orders").withColumn("zval",
        graft.ops.Layout.zValue(col("o_custkey"), day, bits = 12))
      graft.ops.Layout.scanZBox(o, col("o_custkey"), day, col("zval"),
          100L, 299L, 1200L, 2399L, bits = 12, maxRanges = 64)
        .select("o_orderkey", "o_custkey", "o_orderstatus")
        .orderBy("o_orderkey")
    }),

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

    "x_sample_weighted" -> ((s, d) =>
      // weighted priority sample (Duffield et al.): P(keep) ∝ n_chars;
      // portable-FNV uniforms + a single IEEE division per row — the
      // oracle replays the exact priority order
      graft.ext.Corpus.prioritySample(t(s, d, "documents"), "doc_id",
          col("n_chars"), k = 100, seed = 7L)
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")),

    "x_ann_pq" -> ((s, d) => {
      // rows-only by design (the k-means shortlist is not SQL-
      // replayable; PqSpec gates recall and proves ADC == dot-on-
      // decoded). Full production pipeline: train 8×16 codebooks,
      // encode 64-dim floats to 8 byte codes (32× compression), ADC-
      // shortlist 30 per query from the codes, exact-rerank to top-10
      val e = t(s, d, "embeddings")
        .select(col("vec_id").as("id"),
          graft.ext.Pq.normalized(col("embedding")).as("v"))
      val queries = e.filter(col("id") < 5)
      val cb = graft.ext.Pq.trainCodebooks(e, "v", "id",
        dim = 64, m = 8, ksub = 16, iterations = 1)
      val enc = graft.ext.Pq.encode(e, cb, "v", "id", dim = 64, m = 8, ksub = 16)
      graft.ext.Pq.adcRerankTopK(enc, cb, queries, e, "v", "id",
          k = 10, shortlistK = 30, dim = 64, m = 8, ksub = 16)
        .orderBy("query_id", "rank")
    }),

    "x_ann_ivfpq" -> ((s, d) => {
      // rows-only by design. FAISS-style IVF-PQ: coarse cells → PQ on
      // RESIDUALS (codes quantize local offsets, not the global
      // spread) → probe + ADC shortlist → exact re-rank. The scale
      // path for ANN over a corpus whose full vectors don't fit hot
      // storage: the scan side holds cell + 8 bytes per vector
      val e = t(s, d, "embeddings")
        .select(col("vec_id").as("id"),
          graft.ext.Pq.normalized(col("embedding")).as("v"))
      // lean build settings for the per-round driver run: quality knobs
      // (Lloyd depth, refine) are gated in PqSpec + the 202k soak; an
      // index is built ONCE and searched many times in production, not
      // rebuilt per query as this end-to-end row does
      val cents = graft.ext.Similarity.refineCentroids(e,
        graft.ext.Similarity.coarseCentroids(e, "v", "id", nCells = 16),
        "v", "id", iterations = 1)
      val (rcb, enc) = graft.ext.Pq.ivfPqIndex(e, cents, "v", "id",
        dim = 64, m = 8, ksub = 16, iterations = 1)
      graft.ext.Pq.ivfPqRerankTopK(enc, cents, rcb, e.filter(col("id") < 5), e,
          "v", "id", k = 10, shortlistK = 30, nProbe = 4,
          dim = 64, m = 8, ksub = 16)
        .orderBy("query_id", "rank")
    }),

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
        events(s, d).select(col("user_id"), expr("ts div 1000").as("tus"),
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

    "x_compression_ratio" -> ((s, d) =>
      // zlib quality signal over the documents table: boilerplate
      // compresses away, entropy soup doesn't (rows-only: a JVM codec
      // has no SQL replay; TextOpsSpec pins the ordering properties
      // and partitioning determinism)
      graft.ext.TextOps.compressionRatio(
        t(s, d, "documents").select(col("doc_id"), col("text")),
        "text", "doc_id")
        .orderBy("id")),

    "x_decontaminate_semantic" -> ((s, d) => {
      // paraphrase-level decontamination: corpus embeddings vs a
      // broadcast benchmark set, codegen'd cosine kernel, flag ≥ 0.30
      val e = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
      val bench = e.filter(col("vec_id") % 100 === 0)
      val corpus = e.filter(col("vec_id") % 100 =!= 0)
      graft.ext.Corpus.decontaminateSemantic(corpus, bench,
        "embedding", "vec_id", threshold = 0.30)
    }),

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
        expr("ts div 1000000000").as("s"),
        (expr("ts div 1000000000") +
          floor(col("value") * 10).cast("long")).as("e"))
      graft.ops.Intervals.mergeOverlapping(iv, "user_id", "s", "e")
    }),

    "q_interval_coverage" -> ((s, d) => {
      // per-user coverage rollup over the merged islands
      val iv = events(s, d).select(col("user_id"),
        expr("ts div 1000000000").as("s"),
        (expr("ts div 1000000000") +
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

    "x_fuzzy_join" -> ((s, d) => {
      // record linkage: entity names = part name + key suffix (unique,
      // like real master-list entities; the bare p_name vocabulary is
      // ~56 strings, which would make every blocking segment hot AND
      // the true answer itself quadratic-sized). Corrupt a third of
      // them by one key-derived char deletion, re-link at edit
      // distance <= 1 via PassJoin segment blocking — candidate space
      // is the blocking join, never |L|x|R|; the oracle replays the
      // same corruption + levenshtein exactly
      val part = t(s, d, "part")
        .select(col("p_partkey"),
          concat(col("p_name"), lit("-"), col("p_partkey")).as("ename"))
      val pos = (col("p_partkey") % 5 + 1).cast("int")
      val dirty = part.filter(col("p_partkey") % 3 === 0)
        .select(col("p_partkey").as("dirty_key"),
          concat(col("ename").substr(lit(1), pos),
            col("ename").substr(pos + lit(2), length(col("ename")))).as("dname"))
      val clean = part.select(col("p_partkey").as("clean_key"), col("ename"))
      graft.ext.Linkage.editDistanceJoin(dirty, clean, "dname", "ename", k = 1)
        .select("dirty_key", "clean_key", "dname", "ename", "dist")
        .orderBy("dirty_key", "clean_key")
    }),

    "x_compact" -> ((s, d) => {
      // compaction round-trip: fragment documents into 32 small files,
      // bin-pack them back, then CHECKSUM THE COMPACTED COPY — the
      // oracle computes the same aggregate over the original table, so
      // a full hash match proves compaction preserved every row byte-
      // for-byte while the emitted file count collapsed
      val tmp = java.nio.file.Files.createTempDirectory("graft_compact")
        .resolve("documents").toString
      t(s, d, "documents").repartition(32).write
        .mode("overwrite").parquet(tmp)
      val rep = graft.ops.Layout.compact(s, tmp, targetBytes = 256L * 1024 * 1024)
      val fnvB = graft.functions.VectorExpressions.fnv1a64(col("text"))
      s.read.parquet(tmp).agg(
        count(lit(1)).as("n"),
        sum(col("doc_id")).as("id_sum"),
        sum(pmod(fnvB, lit(1000000L))).as("text_fnv_sum"),
        sum(col("n_chars")).as("chars_sum"))
        .withColumn("compacted", lit(rep.filesAfter < rep.filesBefore))
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
        .orderBy("user_id", "valid_from", "event_type")),

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
    })
  )

  /** DuckDB fragment: FNV-1a 64 over the ASCII string expression `s`
    * (unsigned HUGEINT) — byte-for-byte the math of
    * [[graft.functions.Fnv1a64]] (128-bit ints stand in for Java's
    * wraparound multiply).
    */
  private def fnvSql(s: String): String =
    s"list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT), " +
      s"list_transform(range(1, length($s) + 1), i -> CAST(ord($s[i]) AS HUGEINT))), " +
      "(acc, b) -> (xor(acc, b) * 1099511628211) % 18446744073709551616)"

  /** DuckDB fragment: reinterpret an unsigned-mod-2⁶⁴ HUGEINT as the
    * signed BIGINT Java/Spark carries.
    */
  private def signedSql(u: String): String =
    s"CAST(CASE WHEN $u >= 9223372036854775808 THEN $u - 18446744073709551616 " +
      s"ELSE $u END AS BIGINT)"

  /** (seed, a, b) VALUES rows mirroring [[Dedup.permuteConsts]] (b as an
    * unsigned literal — DuckDB side works mod 2⁶⁴).
    */
  private def seedRowsSql: String = (0 until 64).map { i =>
    val (a, b) = Dedup.permuteConsts(i)
    s"($i, CAST($a AS HUGEINT), CAST(${java.lang.Long.toUnsignedString(b)} AS HUGEINT))"
  }.mkString(", ")

  /** (bit, 2^bit) VALUES rows for the simhash bit extraction. */
  private def bitRowsSql: String = (0 until 64).map { b =>
    s"($b, CAST(${java.math.BigInteger.ONE.shiftLeft(b)} AS HUGEINT))"
  }.mkString(", ")

  def oracleSql: Map[String, String] = Map(
    "q01_scan_count" -> "SELECT count(*) AS cnt FROM lineitem",

    "q02_halfday_scan" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
        |WHERE (l_shipdate >= TIMESTAMP '1995-03-01 00:00:00' AND l_shipdate < TIMESTAMP '1995-03-01 12:00:00')
        |   OR (l_shipdate >= TIMESTAMP '1995-03-01 12:00:00' AND l_shipdate < TIMESTAMP '1995-03-02 00:00:00')
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q03_filter_pushdown" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority FROM orders
        |WHERE o_orderstatus = 'F' AND o_orderpriority IN ('1-URGENT','2-HIGH') AND o_totalprice > 50000.0
        |ORDER BY o_orderkey""".stripMargin,

    "q04_count_filtered" ->
      "SELECT count(*) AS cnt FROM orders WHERE o_orderstatus = 'O'",

    "q05_detail_join" ->
      """SELECT o.o_orderkey, o.o_totalprice,
        |  COALESCE(d.n_lines, 0) AS n_lines, COALESCE(d.sum_qty, 0.0) AS sum_qty
        |FROM orders o LEFT JOIN (
        |  SELECT l_orderkey, count(*) AS n_lines,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey) d ON o.o_orderkey = d.l_orderkey
        |ORDER BY o.o_orderkey""".stripMargin,

    "q06_semi_guard" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
        |ORDER BY o_orderkey""".stripMargin,

    "q07_dim_scan" ->
      """SELECT n_nationkey, n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY n_nationkey""".stripMargin,

    "q08_projection_drop" ->
      "SELECT p_partkey, p_name, p_brand, p_size FROM part ORDER BY p_partkey",

    "q09_select_reorder" ->
      "SELECT c_mktsegment, c_name, c_custkey FROM customer ORDER BY c_custkey",

    "q10_rename" ->
      "SELECT s_suppkey, s_name AS supplier_name, s_acctbal AS balance FROM supplier ORDER BY s_suppkey",

    "q11_ts_filter" ->
      """SELECT o_orderkey, o_orderdate FROM orders
        |WHERE o_orderdate > TIMESTAMP '2000-06-01 00:00:00' ORDER BY o_orderkey""".stripMargin,

    "q12_in_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000.0)
        |ORDER BY o_orderkey""".stripMargin,

    "q13_cast" ->
      """SELECT l_orderkey, l_linenumber, CAST(l_linenumber AS BIGINT) AS ln_big,
        |  CAST(floor(l_quantity) AS INTEGER) AS qty_floor
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q14_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem ORDER BY l_returnflag, l_linestatus",

    "q15_default_row" ->
      """SELECT r_regionkey, r_name FROM region
        |UNION ALL
        |SELECT CAST(-1 AS INTEGER) AS r_regionkey, 'UNASSIGNED' AS r_name
        |WHERE NOT EXISTS (SELECT 1 FROM region WHERE r_regionkey = -1)
        |ORDER BY r_regionkey""".stripMargin,

    "q16_empty_shortcircuit" ->
      "SELECT count(*) AS cnt FROM orders WHERE o_totalprice < 0.0",

    "q17_flatten_roundtrip" ->
      """SELECT l_orderkey, l_partkey, l_linenumber, l_quantity FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_quantity""".stripMargin,

    "q18_flatten_prefix" ->
      """SELECT o.o_orderkey, o.o_orderdate, l.l_partkey AS li_l_partkey, l.l_linenumber AS li_l_linenumber
        |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |WHERE o.o_orderkey % 2 = 0
        |ORDER BY o.o_orderkey, o.o_orderdate, li_l_linenumber, li_l_partkey""".stripMargin,

    "q19_flatten_outer" ->
      """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        |FROM customer c LEFT JOIN (
        |  SELECT o_custkey, o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 4 = 0) o
        |ON c.c_custkey = o.o_custkey
        |ORDER BY c.c_custkey, o.o_orderkey ASC NULLS FIRST""".stripMargin,

    "q20_flatten_two_level" ->
      """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice, l.l_linenumber, l.l_quantity
        |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |WHERE o.o_orderkey % 4 = 0
        |ORDER BY c.c_custkey, o.o_orderkey, o.o_totalprice, l.l_linenumber, l.l_quantity""".stripMargin,

    "q21_tag_labels" ->
      """SELECT DISTINCT l.l_partkey AS tag_id, l.l_suppkey AS label_id
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |ORDER BY tag_id, label_id""".stripMargin,

    "q22_session_tags" ->
      """SELECT l.l_orderkey AS session_id, l.l_partkey AS tag_id, l.l_linenumber, l.l_quantity
        |FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |WHERE o.o_orderkey % 4 = 0 AND l.l_orderkey % 4 = 0
        |ORDER BY session_id, tag_id, l_linenumber, l_quantity""".stripMargin,

    "q23_session_categories" ->
      """SELECT l.l_orderkey AS session_id, l.l_suppkey AS category_id,
        |  CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS score
        |FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |WHERE o.o_orderkey % 4 = 0 AND l.l_orderkey % 4 = 0
        |GROUP BY 1, 2 ORDER BY session_id, category_id, score""".stripMargin,

    "q24_session_reviewers" ->
      """SELECT l.l_orderkey AS session_id, l.l_suppkey AS reviewer_id,
        |  max(l.l_shipdate) AS last_reviewed_at
        |FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |WHERE o.o_orderkey % 4 = 0 AND l.l_orderkey % 4 = 0
        |GROUP BY 1, 2 ORDER BY session_id, reviewer_id, last_reviewed_at""".stripMargin,

    "q25_session_scores" ->
      """SELECT l.l_orderkey AS session_id, l.l_partkey % 5 AS scorecard_id,
        |  l.l_suppkey % 7 AS reviewer_id, l.l_linenumber AS point_id, l.l_quantity AS value
        |FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |WHERE o.o_orderkey % 4 = 0 AND l.l_orderkey % 4 = 0
        |ORDER BY session_id, scorecard_id, reviewer_id, point_id, value""".stripMargin,

    "q26_session_comments" ->
      """SELECT l.l_orderkey AS session_id, l.l_suppkey AS author_id,
        |  l.l_returnflag || '-' || l.l_linestatus AS text
        |FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |WHERE o.o_orderkey % 4 = 0 AND l.l_orderkey % 4 = 0
        |ORDER BY session_id, author_id, text""".stripMargin,

    "q27_session_summary" ->
      """SELECT l.l_orderkey AS session_id, max(l.l_returnflag) AS text
        |FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |WHERE o.o_orderkey % 4 = 0 AND l.l_orderkey % 4 = 0
        |GROUP BY 1 ORDER BY session_id, text""".stripMargin,

    "q27b_session_crm" ->
      """SELECT DISTINCT l.l_orderkey AS session_id, l.l_linestatus AS crm_status
        |FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |WHERE o.o_orderkey % 4 = 0 AND l.l_orderkey % 4 = 0
        |ORDER BY session_id, crm_status""".stripMargin,

    "q28_broadcast_enrich" ->
      """SELECT l.l_orderkey, l.l_linenumber, s.s_name, n.n_name
        |FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin,

    "q29_left_join_detail" ->
      """SELECT o.o_orderkey, c.c_name, c.c_mktsegment
        |FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY o.o_orderkey""".stripMargin,

    "q30_star_agg" ->
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

    "q31_conditional_agg" ->
      """SELECT o_custkey,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS sum_f,
        |  CAST(sum(CASE WHEN o_orderstatus <> 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS sum_other,
        |  count(*) AS n_orders
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "q32_ratio_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS qty_per_price
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q33_channel_agg" ->
      """SELECT event_type,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        |  count(*) AS n, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q34_topk" ->
      """SELECT o_custkey, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
        |FROM orders GROUP BY o_custkey
        |ORDER BY total_spent DESC, o_custkey ASC LIMIT 10""".stripMargin,

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

    "q35_ts_round" ->
      """SELECT l_orderkey, l_linenumber,
        |  make_timestamp(((epoch_us(l_shipdate + ((l_orderkey * 7919 + l_linenumber) % 86400000) * INTERVAL 1 MILLISECOND) + 500000) // 1000000) * 1000000) AS ts_rounded
        |FROM lineitem WHERE l_orderkey < 500
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q36_sentinel_date" ->
      """WITH src AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 100 = 0 THEN '0001-01-01T00:00:00'
        |         ELSE strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') END AS dt_str
        |  FROM orders)
        |SELECT o_orderkey,
        |  CASE WHEN dt_str IS NOT NULL AND TRY_CAST(dt_str AS TIMESTAMP) IS NULL THEN TIMESTAMP '1900-01-01 00:00:00'
        |       WHEN TRY_CAST(dt_str AS TIMESTAMP) < TIMESTAMP '1677-09-22 00:00:00' THEN TIMESTAMP '1900-01-01 00:00:00'
        |       ELSE TRY_CAST(dt_str AS TIMESTAMP) END AS dt_clean
        |FROM src ORDER BY o_orderkey""".stripMargin,

    "q37_regex_salvage" ->
      """WITH src AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 10 = 0 THEN 'corrupted>>' || strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') || '<<'
        |         ELSE strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') END AS dt_str
        |  FROM orders)
        |SELECT o_orderkey,
        |  COALESCE(TRY_CAST(dt_str AS TIMESTAMP),
        |    try_strptime(regexp_extract(dt_str, '(\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2})', 1), '%Y-%m-%dT%H:%M:%S')) AS dt_parsed
        |FROM src ORDER BY o_orderkey""".stripMargin,

    "q38_split_datetime" ->
      """SELECT o_orderkey,
        |  split_part(strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S'), 'T', 1) AS d_date,
        |  substr(split_part(strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S'), 'T', 2), 1, 5) AS d_time
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q39_make_link" ->
      """SELECT o_orderkey,
        |  'https://app.example.com/main/conversations/view?session_id=' || CAST(o_orderkey AS VARCHAR) AS et_link
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q40_json_extract" ->
      """SELECT event_id, TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
        |FROM events ORDER BY event_id""".stripMargin,

    // A → 'A', é → 'é', \t → tab, prefixed onto the raw text
    "q41_unicode_unescape" ->
      """SELECT doc_id, 'Aé' || chr(9) || text AS unescaped
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q42_nan_to_null" ->
      """WITH src AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CASE WHEN l_orderkey % 7 = 0 THEN CAST('NaN' AS DOUBLE) ELSE l_tax END AS v
        |  FROM lineitem)
        |SELECT l_orderkey, l_linenumber,
        |  CASE WHEN isnan(v) THEN NULL ELSE v END AS v_clean
        |FROM src ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q43_date_arith" ->
      """SELECT o_orderkey, o_orderdate - INTERVAL 1 DAY AS prev_day,
        |  strftime(o_orderdate, '%Y-%m-%d') AS day_str
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q44_iso_format" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') AS iso_dt
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    // p_name is [a-z ]: form-encoding is exactly space→'+'
    "q_url_codec" ->
      """SELECT p_partkey, replace(p_name, ' ', '+') AS enc, p_name AS roundtrip
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q45_upsert" ->
      """WITH tgt AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 3 <> 0),
        |upd AS (
        |  SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice + 1000.0 AS o_totalprice
        |  FROM orders WHERE o_orderkey % 2 = 0)
        |SELECT t.* FROM tgt t WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.o_orderkey = t.o_orderkey)
        |UNION ALL SELECT u.* FROM upd u
        |ORDER BY o_orderkey""".stripMargin,

    "q46_upsert_dedup" ->
      """WITH base AS (SELECT o_orderkey, o_totalprice FROM orders),
        |batch AS (
        |  SELECT o_orderkey, o_totalprice + 1.0 AS o_totalprice, 1 AS seq FROM base WHERE o_orderkey % 4 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice + 2.0 AS o_totalprice, 2 AS seq FROM base WHERE o_orderkey % 8 = 0),
        |deduped AS (
        |  SELECT o_orderkey, o_totalprice, seq FROM batch
        |  QUALIFY row_number() OVER (PARTITION BY o_orderkey ORDER BY seq DESC) = 1),
        |tgt AS (SELECT o_orderkey, o_totalprice, 0 AS seq FROM base WHERE o_orderkey % 3 = 0)
        |SELECT t.* FROM tgt t WHERE NOT EXISTS (SELECT 1 FROM deduped u WHERE u.o_orderkey = t.o_orderkey)
        |UNION ALL SELECT u.* FROM deduped u
        |ORDER BY o_orderkey""".stripMargin,

    "q47_schema_reconcile" ->
      "SELECT s_suppkey, s_name, s_acctbal FROM supplier ORDER BY s_suppkey",

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

    // single-batch transformWithState == batch aggregate per user
    "q_stream_running_stats" ->
      """SELECT o_custkey AS user_id, count(*) AS n_events,
        |  max(CAST(o_orderdate AS TIMESTAMP)) AS last_seen
        |FROM orders GROUP BY o_custkey ORDER BY user_id""".stripMargin,

    "q50_tumbling_agg" ->
      """SELECT date_trunc('month', o_orderdate) AS w, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY 1 ORDER BY w""".stripMargin,

    "q_paged_extract" ->
      "SELECT doc_id, lang, n_chars FROM documents ORDER BY doc_id",

    "q_paged_scan_v2" ->
      "SELECT doc_id, lang, n_chars FROM documents ORDER BY doc_id",

    "q_stream_paged" ->
      "SELECT doc_id, lang, n_chars FROM documents ORDER BY doc_id",

    // repetition replay: same tokenizer; n-gram counts over the shingle
    // STRINGS (count-equivalent to the engine's shingle hashes)
    "x_repetition" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
        |  FROM documents),
        |tokc AS (SELECT doc_id, t, count(*) AS c FROM tok WHERE t <> '' GROUP BY doc_id, t),
        |toks AS (
        |  SELECT doc_id, round(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6) AS top_token_frac
        |  FROM tokc GROUP BY doc_id),
        |d AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w FROM documents),
        |ngr AS (
        |  SELECT doc_id, unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS s
        |  FROM d),
        |ngrc AS (SELECT doc_id, s, count(*) AS c FROM ngr GROUP BY doc_id, s),
        |ngrs AS (
        |  SELECT doc_id,
        |    round(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6) AS top_ngram_frac,
        |    round(CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6) AS dup_ngram_frac
        |  FROM ngrc GROUP BY doc_id)
        |SELECT doc.doc_id, toks.top_token_frac, ngrs.top_ngram_frac, ngrs.dup_ngram_frac
        |FROM documents doc
        |LEFT JOIN toks ON doc.doc_id = toks.doc_id
        |LEFT JOIN ngrs ON doc.doc_id = ngrs.doc_id
        |ORDER BY doc.doc_id""".stripMargin,

    // same deterministic PII injection, same RE2-safe patterns with 'g'
    "x_pii_redact" ->
      """WITH dirty AS (
        |  SELECT doc_id,
        |    text || ' contact user' || doc_id || '@example.com or +1 555 01' || doc_id
        |      || ' at 10.0.' || (doc_id % 256) || '.7' AS d
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(
        |      regexp_replace(d, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
        |    '\+[0-9][0-9 -]{6,}[0-9]', '<PHONE>', 'g') AS clean
        |FROM dirty ORDER BY doc_id""".stripMargin,

    // the boundary-split tokens ARE the maximal alnum / non-alnum-non-
    // space runs (exact on ASCII; lookarounds not needed to count runs)
    "x_bpe_tokens" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9[:space:]]+')) AS INTEGER) AS n_bpe_ish
        |FROM documents ORDER BY doc_id""".stripMargin,

    // replay of the deterministic packing layout (seed 7, 8 buckets)
    "x_pack_offsets" ->
      s"""WITH hx AS (
         |  SELECT doc_id,
         |    CASE WHEN length(trim(text)) = 0 THEN 0
         |         ELSE len(string_split_regex(trim(text), '\\s+')) END AS toks,
         |    ${fnvSql("(coalesce(CAST(doc_id AS VARCHAR), chr(0) || 'null') || ':7')")} AS hu
         |  FROM documents),
         |m AS (
         |  SELECT doc_id, toks, ${signedSql("hu")} AS h,
         |    ((${signedSql("hu")} % 8) + 8) % 8 AS pack_bucket
         |  FROM hx),
         |c AS (
         |  SELECT doc_id, pack_bucket,
         |    CAST(sum(toks) OVER (PARTITION BY pack_bucket ORDER BY h ASC, doc_id ASC
         |                         ROWS UNBOUNDED PRECEDING) - toks AS BIGINT) AS pack_offset
         |  FROM m)
         |SELECT doc_id, pack_bucket, pack_offset, pack_offset // 2048 AS bin_id
         |FROM c ORDER BY doc_id""".stripMargin,

    // replay of the deterministic-order cumulative token cutoff (seed 7)
    "x_mixture_budget" ->
      s"""WITH hx AS (
         |  SELECT doc_id, lang,
         |    CASE WHEN length(trim(text)) = 0 THEN 0
         |         ELSE len(string_split_regex(trim(text), '\\s+')) END AS toks,
         |    ${fnvSql("(coalesce(CAST(doc_id AS VARCHAR), chr(0) || 'null') || ':7')")} AS hu
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, lang,
         |    sum(toks) OVER (PARTITION BY lang ORDER BY ${signedSql("hu")} ASC, doc_id ASC
         |                    ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM hx)
         |SELECT doc_id, lang FROM c
         |WHERE (CASE WHEN lang = 'en' THEN 5000 WHEN lang = 'de' THEN 2000 ELSE 0 END) > 0
         |  AND cum <= CASE WHEN lang = 'en' THEN 5000 WHEN lang = 'de' THEN 2000 ELSE 0 END
         |ORDER BY doc_id""".stripMargin,

    // composed replay of the full curation chain: quality (x_quality's
    // scoring) → 5-gram decontamination vs doc_id<20 → exact dedup
    // (normalized-text min-id) → jaccard pairs → recursive-CTE cluster
    // resolution → cluster minima
    "x_curation_e2e" ->
      """WITH RECURSIVE base AS (
        |  SELECT doc_id, length(text) AS len,
        |    CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
        |      / greatest(CAST(length(text) AS DOUBLE), 1.0) AS alpha,
        |    CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS DOUBLE)
        |      / greatest(CAST(length(text) AS DOUBLE), 1.0) AS punct,
        |    CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      x -> x IN ('the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','was','at','by','be','this'))) AS DOUBLE)
        |      / greatest(CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS DOUBLE), 1.0) AS stop
        |  FROM documents),
        |parts AS (
        |  SELECT doc_id,
        |    CASE WHEN len BETWEEN 50 AND 100000 THEN 1.0 WHEN len BETWEEN 10 AND 49 THEN 0.5 ELSE 0.0 END AS len_ok,
        |    CASE WHEN alpha >= 0.6 THEN 1.0 WHEN alpha >= 0.3 THEN 0.5 ELSE 0.0 END AS alpha_ok,
        |    CASE WHEN punct <= 0.2 THEN 1.0 ELSE 0.0 END AS punct_ok,
        |    CASE WHEN stop >= 0.05 THEN 1.0 ELSE 0.0 END AS stop_ok
        |  FROM base),
        |qd AS (
        |  SELECT d.doc_id, d.text, d.lang FROM documents d JOIN parts p ON d.doc_id = p.doc_id
        |  WHERE round(p.len_ok * 0.3 + p.alpha_ok * 0.3 + p.punct_ok * 0.2 + p.stop_ok * 0.2, 2) >= 0.5),
        |g1 AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w FROM qd),
        |grams AS (
        |  SELECT doc_id, unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]
        |                         FOR i IN range(1, len(w) - 3)]) AS s
        |  FROM g1),
        |bw AS (SELECT string_split_regex(lower(trim(text)), '\s+') AS w FROM documents WHERE doc_id < 20),
        |bgrams AS (
        |  SELECT DISTINCT unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]
        |                          FOR i IN range(1, len(w) - 3)]) AS s
        |  FROM bw),
        |contaminated AS (SELECT DISTINCT g.doc_id FROM grams g JOIN bgrams b ON g.s = b.s),
        |clean AS (
        |  SELECT doc_id, text, lang FROM qd
        |  WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
        |ex AS (
        |  SELECT doc_id, text, lang FROM clean WHERE doc_id IN (
        |    SELECT min(doc_id) FROM clean
        |    GROUP BY lower(regexp_replace(trim(text), '\s+', ' ', 'g')))),
        |shw AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w FROM ex),
        |sh AS (
        |  SELECT DISTINCT doc_id, s FROM (
        |    SELECT doc_id, unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w) - 1)]) AS s
        |    FROM shw)),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |prs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |jp AS (
        |  SELECT p.id_a, p.id_b FROM prs p
        |  JOIN sizes sa ON p.id_a = sa.doc_id JOIN sizes sb ON p.id_b = sb.doc_id
        |  WHERE CAST(p.inter AS DOUBLE) / (sa.n + sb.n - p.inter) >= 0.5),
        |edges AS (
        |  SELECT id_a AS s, id_b AS t FROM jp
        |  UNION ALL SELECT id_b, id_a FROM jp),
        |reach(id, lbl) AS (
        |  SELECT doc_id, doc_id FROM ex
        |  UNION
        |  SELECT e.t, r.lbl FROM reach r JOIN edges e ON e.s = r.id),
        |cc AS (SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY id)
        |SELECT ex.doc_id, ex.lang FROM ex JOIN cc ON ex.doc_id = cc.doc_id
        |WHERE cc.doc_id = cc.cluster_id
        |ORDER BY ex.doc_id""".stripMargin,

    // replay of the FNV sample-bucket membership decision (seed 7)
    "x_sample_stratified" ->
      s"""WITH h AS (
         |  SELECT doc_id, lang, ${fnvSql("(coalesce(CAST(doc_id AS VARCHAR), chr(0) || 'null') || ':7')")} AS hu
         |  FROM documents),
         |m AS (
         |  SELECT doc_id, lang,
         |    ((${signedSql("hu")} % 1000000) + 1000000) % 1000000 AS b
         |  FROM h)
         |SELECT doc_id, lang FROM m
         |WHERE b < CAST((CASE WHEN lang = 'en' THEN 0.5 WHEN lang = 'de' THEN 0.25 ELSE 0.0 END) * 1000000.0 AS BIGINT)
         |ORDER BY doc_id""".stripMargin,

    "q_stream_windowed_counts" ->
      """SELECT date_trunc('day', o_orderdate) AS window_start,
        |  o_orderstatus AS event_type, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM orders GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,

    // full-arrival AvailableNow pass ⇒ the interval join emits exactly
    // the batch non-equi join
    "q_stream_interval_join" ->
      """SELECT f.o_custkey AS user_id, f.o_orderkey AS click_id, o.o_orderkey AS view_id
        |FROM orders f JOIN orders o
        |  ON f.o_custkey = o.o_custkey
        |  AND o.o_orderdate >= f.o_orderdate - INTERVAL 30 DAY
        |  AND o.o_orderdate <= f.o_orderdate + INTERVAL 30 DAY
        |WHERE f.o_orderstatus = 'F' AND o.o_orderstatus = 'O'
        |ORDER BY user_id, click_id, view_id""".stripMargin,

    // the stream ingests the same drop twice; the dedup output must be
    // the plain batch table (orderkey is the key and is unique)
    "q_stream_dedup" ->
      """SELECT o_orderkey, o_orderdate AS ts, o_orderstatus, o_totalprice
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q51_late_window_resync" ->
      """SELECT o_orderkey, o_orderdate, o_orderstatus FROM orders
        |WHERE o_orderdate >= TIMESTAMP '2001-07-01 00:00:00' AND o_orderstatus = 'F'
        |ORDER BY o_orderkey""".stripMargin,

    "q52_changed_dim_facts" ->
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_nationkey IN (1,2,3))
        |ORDER BY o_orderkey""".stripMargin,

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

    // Mann-Whitney replay: distinct-score groups, negatives-below
    // window, doubled half-tie credit in HUGEINT (== the engine's
    // decimal), one double division
    "q_auc" ->
      """WITH e AS (
        |  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y, value AS s FROM events),
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
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(30,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2))) AS DECIMAL(30,6))) AS DOUBLE) AS sum_charge,
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

    "q_unpivot" ->
      """SELECT * FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem)
        |ORDER BY l_orderkey, l_linenumber, metric, value""".stripMargin,

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

    "x_nfc" ->
      """SELECT doc_id,
        |  length(text || 'e' || chr(769)) AS n_raw,
        |  length(nfc_normalize(text || 'e' || chr(769))) AS n_nfc,
        |  (text || 'e' || chr(769)) != nfc_normalize(text || 'e' || chr(769)) AS changed
        |FROM documents ORDER BY doc_id""".stripMargin,

    // pagerank: 3 unrolled synchronous steps, decimal-accumulated edge
    // contributions, IEEE-replayed scalar update (note (CAST(1 AS
    // DOUBLE) - 0.85), the same runtime subtraction the engine does —
    // NOT a pre-simplified 0.15, which is a different double)
    "q_pagerank" ->
      """WITH e AS (
        |  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |nn AS (SELECT count(*) AS n FROM nodes),
        |od AS (SELECT src, count(*) AS od FROM e GROUP BY src),
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
        |  round(CAST(o.vs AS DOUBLE) / o.n, 6) AS value_avg,
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
        |  SELECT s.event_type, s.slot, round(CAST(o.vs AS DOUBLE) / o.n, 6) AS v
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
        |  SELECT s.event_type, s.slot, round(CAST(o.vs AS DOUBLE) / o.n, 6) AS v
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

    "x_ann_ivf_recall" ->
      """SELECT * FROM (VALUES ('ivf_mean_recall10_ge_070', TRUE),
        |  ('ivfpq_mean_recall10_ge_065', TRUE))
        |AS t(check_name, ok) ORDER BY check_name""".stripMargin,

    "x_embed_neardup_incr" ->
      """SELECT * FROM (VALUES ('incr_no_false_positives', TRUE),
        |  ('incr_recall_ge_090', TRUE))
        |AS t(check_name, ok) ORDER BY check_name""".stripMargin,

    "x_embed_neardup_bucketed" ->
      """SELECT * FROM (VALUES ('bucketed_no_false_positives', TRUE),
        |  ('bucketed_recall_ge_090', TRUE))
        |AS t(check_name, ok) ORDER BY check_name""".stripMargin,

    // the decoded dims/kind are only 'image'/32/32 when the codec
    // really decoded each rendered blob — the oracle asserts that per row
    "x_multimodal_features" ->
      """SELECT doc_id, 'image' AS media_kind, 32 AS width, 32 AS height
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin,

    // frame offsets replay in SQL (range list per doc, inner semantics:
    // zero duration → no rows); the decoded-feature range rides as f0_ok
    "x_multimodal_frames" ->
      """SELECT doc_id, duration_ms, unnest(range(0, duration_ms, 1000)) AS frame_ms,
        |       TRUE AS f0_ok
        |FROM (SELECT doc_id, CAST(n_chars % 5 * 1000 AS BIGINT) AS duration_ms
        |      FROM documents WHERE doc_id < 100)
        |ORDER BY doc_id, frame_ms""".stripMargin,

    // pigeonhole-exact banding + ~32-bit seed separation ⇒ the pair set
    // is exactly the planted twins, enumerable in SQL
    "x_multimodal_neardup" ->
      """SELECT doc_id AS id_a, doc_id + 1000000 AS id_b
        |FROM documents WHERE doc_id < 2000 AND doc_id % 7 = 0
        |ORDER BY id_a, id_b""".stripMargin,

    // the media kernels run codecs a SQL engine doesn't have — the
    // self-check computes every invariant ENGINE-side and the oracle
    // hash-matches the literal expected verdicts
    "x_multimodal_selfcheck" ->
      """SELECT * FROM (VALUES
        |  ('decoded_all', TRUE), ('dhash_locality', TRUE),
        |  ('features_match', TRUE), ('neardup_planted_twins', TRUE),
        |  ('resize_roundtrip', TRUE), ('wav_decode', TRUE))
        |AS t(check_name, ok) ORDER BY check_name""".stripMargin,

    "x_dedup_exact" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE doc_id IN (
        |  SELECT min(doc_id) FROM documents
        |  GROUP BY lower(regexp_replace(trim(text), '\s+', ' ', 'g')))
        |ORDER BY doc_id""".stripMargin,

    "x_dedup_exact_best" ->
      """SELECT doc_id, lang, n_chars FROM (
        |  SELECT doc_id, lang, n_chars,
        |    row_number() OVER (
        |      PARTITION BY lower(regexp_replace(trim(text), '\s+', ' ', 'g'))
        |      ORDER BY n_chars DESC NULLS LAST, doc_id ASC) AS rn
        |  FROM documents) WHERE rn = 1
        |ORDER BY doc_id""".stripMargin,

    "x_dedup_jaccard" ->
      """WITH d AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
        |  FROM documents WHERE doc_id < 300),
        |sh AS (
        |  SELECT DISTINCT doc_id, s FROM (
        |    SELECT doc_id, unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w) - 1)]) AS s
        |    FROM d)),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id)
        |SELECT p.id_a, p.id_b,
        |  round(CAST(p.inter AS DOUBLE) / (sa.n + sb.n - p.inter), 6) AS jaccard
        |FROM pairs p JOIN sizes sa ON p.id_a = sa.doc_id JOIN sizes sb ON p.id_b = sb.doc_id
        |WHERE CAST(p.inter AS DOUBLE) / (sa.n + sb.n - p.inter) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,

    // jaccard pairs (same CTE chain as x_dedup_jaccard) → undirected
    // edges → recursive min-label reachability → min reachable id per
    // node = cluster id (singletons label themselves)
    "x_dedup_clusters" ->
      """WITH RECURSIVE d AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
        |  FROM documents WHERE doc_id < 300),
        |sh AS (
        |  SELECT DISTINCT doc_id, s FROM (
        |    SELECT doc_id, unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w) - 1)]) AS s
        |    FROM d)),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |jp AS (
        |  SELECT p.id_a, p.id_b FROM pairs p
        |  JOIN sizes sa ON p.id_a = sa.doc_id JOIN sizes sb ON p.id_b = sb.doc_id
        |  WHERE CAST(p.inter AS DOUBLE) / (sa.n + sb.n - p.inter) >= 0.5),
        |edges AS (
        |  SELECT id_a AS s, id_b AS t FROM jp
        |  UNION ALL SELECT id_b, id_a FROM jp),
        |reach(id, lbl) AS (
        |  SELECT doc_id, doc_id FROM d
        |  UNION
        |  SELECT e.t, r.lbl FROM reach r JOIN edges e ON e.s = r.id),
        |cc AS (SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY id)
        |SELECT doc_id, cluster_id,
        |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size
        |FROM cc ORDER BY doc_id""".stripMargin,

    // full LSH replay: FNV-1a shingle hashes → 64 permuted mins → 16
    // band buckets → bucket self-join → positional signature agreement
    "x_dedup_minhash" ->
      s"""WITH d AS (
         |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
         |  FROM documents WHERE doc_id < 300),
         |shg AS (
         |  SELECT doc_id, unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w) - 1)]) AS s
         |  FROM d),
         |h AS (SELECT doc_id, ${fnvSql("s")} AS hu FROM shg),
         |seeds(seed, a, b) AS (VALUES $seedRowsSql),
         |perm AS (
         |  SELECT doc_id, seed, min(${signedSql("((a * hu + b) % 18446744073709551616)")}) AS m
         |  FROM h CROSS JOIN seeds GROUP BY doc_id, seed),
         |sig AS (SELECT doc_id, array_agg(m ORDER BY seed) AS sa FROM perm GROUP BY doc_id),
         |bs AS (
         |  SELECT doc_id, band,
         |    CAST(band AS VARCHAR) || ',' || array_to_string(list_slice(sa, band * 4 + 1, band * 4 + 4), ',') AS bstr
         |  FROM sig CROSS JOIN range(16) t(band)),
         |bk AS (SELECT doc_id, band, ${fnvSql("bstr")} AS bucket FROM bs),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
         |est AS (
         |  SELECT id_a, id_b,
         |    CAST(list_sum(list_transform(range(1, 65), i -> CASE WHEN s1.sa[i] = s2.sa[i] THEN 1 ELSE 0 END)) AS DOUBLE) / 64.0 AS est_jaccard
         |  FROM cand JOIN sig s1 ON cand.id_a = s1.doc_id JOIN sig s2 ON cand.id_b = s2.doc_id)
         |SELECT id_a, id_b, est_jaccard FROM est
         |WHERE est_jaccard >= 0.5 ORDER BY id_a, id_b""".stripMargin,

    // same LSH replay, asymmetric: store (doc_id < 200) × incoming
    // (200–299) instead of a self-join
    "x_dedup_incremental" ->
      s"""WITH d AS (
         |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
         |  FROM documents WHERE doc_id < 300),
         |shg AS (
         |  SELECT doc_id, unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w) - 1)]) AS s
         |  FROM d),
         |h AS (SELECT doc_id, ${fnvSql("s")} AS hu FROM shg),
         |seeds(seed, a, b) AS (VALUES $seedRowsSql),
         |perm AS (
         |  SELECT doc_id, seed, min(${signedSql("((a * hu + b) % 18446744073709551616)")}) AS m
         |  FROM h CROSS JOIN seeds GROUP BY doc_id, seed),
         |sig AS (SELECT doc_id, array_agg(m ORDER BY seed) AS sa FROM perm GROUP BY doc_id),
         |bs AS (
         |  SELECT doc_id, band,
         |    CAST(band AS VARCHAR) || ',' || array_to_string(list_slice(sa, band * 4 + 1, band * 4 + 4), ',') AS bstr
         |  FROM sig CROSS JOIN range(16) t(band)),
         |bk AS (SELECT doc_id, band, ${fnvSql("bstr")} AS bucket FROM bs),
         |cand AS (
         |  SELECT DISTINCT b.doc_id AS id_new, a.doc_id AS id_store
         |  FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket
         |  WHERE a.doc_id < 200 AND b.doc_id >= 200),
         |est AS (
         |  SELECT id_new, id_store,
         |    CAST(list_sum(list_transform(range(1, 65), i -> CASE WHEN s1.sa[i] = s2.sa[i] THEN 1 ELSE 0 END)) AS DOUBLE) / 64.0 AS est_jaccard
         |  FROM cand JOIN sig s1 ON cand.id_new = s1.doc_id JOIN sig s2 ON cand.id_store = s2.doc_id)
         |SELECT id_new, id_store, est_jaccard FROM est
         |WHERE est_jaccard >= 0.5 ORDER BY id_new, id_store""".stripMargin,

    // rotations=8/prefixBits=8 is exact for hamming ≤ 7 (8 disjoint
    // blocks, pigeonhole) → oracle is brute-force all-pairs hamming
    "x_dedup_simhash" ->
      s"""WITH d AS (
         |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
         |  FROM documents WHERE doc_id < 300),
         |shg AS (
         |  SELECT doc_id, unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w) - 1)]) AS s
         |  FROM d),
         |h AS (SELECT doc_id, ${fnvSql("s")} AS hu FROM shg),
         |bits(bit, p) AS (VALUES $bitRowsSql),
         |votes AS (
         |  SELECT doc_id, bit, p, sum(CASE WHEN (hu // p) % 2 = 1 THEN 1 ELSE -1 END) AS v
         |  FROM h CROSS JOIN bits GROUP BY doc_id, bit, p),
         |shu AS (SELECT doc_id, sum(CASE WHEN v > 0 THEN p ELSE CAST(0 AS HUGEINT) END) AS u FROM votes GROUP BY doc_id),
         |sh2 AS (SELECT doc_id, ${signedSql("u")} AS sh FROM shu)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
         |FROM sh2 a JOIN sh2 b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sh, b.sh)) <= 7
         |ORDER BY id_a, id_b""".stripMargin,

    "x_fingerprint" ->
      s"""WITH n AS (
         |  SELECT doc_id, lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS nt
         |  FROM documents),
         |hh AS (SELECT doc_id, ${fnvSql("nt")} AS hu FROM n)
         |SELECT doc_id, ${signedSql("hu")} AS fp FROM hh ORDER BY doc_id""".stripMargin,

    // BM25 replay: same tokenizer, same idf form, same fixed-order
    // per-term score assembly (max-of-CASE per term, summed left to
    // right) so the double math is bit-identical
    "x_bm25_search" ->
      """WITH lens AS (
        |  SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN CAST(0 AS BIGINT)
        |                      ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) END AS len
        |  FROM documents),
        |stats AS (SELECT count(*) AS n_docs, sum(len) AS sum_len FROM lens),
        |tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term FROM documents)
        |  WHERE term IN ('spark', 'vector', 'merge') GROUP BY doc_id, term),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |sc AS (
        |  SELECT tf.doc_id, tf.term,
        |    ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
        |      * (CAST(tf.tf AS DOUBLE) * 2.2)
        |      / (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(lens.len AS DOUBLE) / (CAST(sum_len AS DOUBLE) / CAST(n_docs AS DOUBLE))))) AS s
        |  FROM tf JOIN df USING (term) CROSS JOIN stats JOIN lens ON tf.doc_id = lens.doc_id),
        |agg AS (
        |  SELECT doc_id,
        |    max(CASE WHEN term = 'spark' THEN s END) AS s0,
        |    max(CASE WHEN term = 'vector' THEN s END) AS s1,
        |    max(CASE WHEN term = 'merge' THEN s END) AS s2
        |  FROM sc GROUP BY doc_id),
        |scored AS (
        |  SELECT doc_id, coalesce(s0, 0.0) + coalesce(s1, 0.0) + coalesce(s2, 0.0) AS score FROM agg),
        |top AS (SELECT doc_id, score FROM scored ORDER BY score DESC, doc_id ASC LIMIT 20)
        |SELECT doc_id, round(score, 6) AS score,
        |  CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rank
        |FROM top ORDER BY rank""".stripMargin,

    "x_ann_bruteforce" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
        |c AS (SELECT vec_id AS corpus_id, embedding AS cv FROM embeddings),
        |scored AS (
        |  SELECT q.query_id, c.corpus_id,
        |    list_sum(list_transform(range(1, len(qv) + 1), i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(range(1, len(qv) + 1), i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(range(1, len(cv) + 1), i -> CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE))))) AS cos
        |  FROM c, q WHERE c.corpus_id <> q.query_id),
        |ranked AS (
        |  SELECT query_id, corpus_id, cos,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, corpus_id ASC) AS rank
        |  FROM scored)
        |SELECT query_id, corpus_id, round(cos, 6) AS cos, CAST(rank AS INTEGER) AS rank
        |FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    "x_embed_neardup" ->
      """WITH e AS (SELECT vec_id, embedding AS v FROM embeddings WHERE vec_id < 300),
        |scored AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    list_sum(list_transform(range(1, len(a.v) + 1), i -> CAST(a.v[i] AS DOUBLE) * CAST(b.v[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(range(1, len(a.v) + 1), i -> CAST(a.v[i] AS DOUBLE) * CAST(a.v[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(range(1, len(b.v) + 1), i -> CAST(b.v[i] AS DOUBLE) * CAST(b.v[i] AS DOUBLE))))) AS cos
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
        |SELECT id_a, id_b, round(cos, 6) AS cos FROM scored WHERE cos >= 0.4
        |ORDER BY id_a, id_b""".stripMargin,

    "x_decontaminate" ->
      """WITH c AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w FROM documents),
        |grams AS (
        |  SELECT doc_id, unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]
        |                         FOR i IN range(1, len(w) - 3)]) AS s
        |  FROM c),
        |bench AS (SELECT DISTINCT s FROM grams WHERE doc_id < 20),
        |contaminated AS (
        |  SELECT DISTINCT g.doc_id FROM grams g JOIN bench b ON g.s = b.s)
        |SELECT doc_id, lang FROM documents
        |WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
        |ORDER BY doc_id""".stripMargin,

    "x_langid" ->
      """WITH p AS (
        |  SELECT doc_id, lang, ' ' || lower(text) || ' ' AS t FROM documents),
        |scored AS (
        |  SELECT doc_id, lang,
        |    (length(t) - length(replace(t, ' the ', ''))) / 5 + (length(t) - length(replace(t, ' and ', ''))) / 5
        |      + (length(t) - length(replace(t, ' of ', ''))) / 4 + (length(t) - length(replace(t, ' is ', ''))) / 4
        |      + (length(t) - length(replace(t, ' to ', ''))) / 4 AS s_en,
        |    (length(t) - length(replace(t, ' der ', ''))) / 5 + (length(t) - length(replace(t, ' die ', ''))) / 5
        |      + (length(t) - length(replace(t, ' und ', ''))) / 5 + (length(t) - length(replace(t, ' ist ', ''))) / 5
        |      + (length(t) - length(replace(t, ' das ', ''))) / 5 AS s_de,
        |    (length(t) - length(replace(t, ' le ', ''))) / 4 + (length(t) - length(replace(t, ' la ', ''))) / 4
        |      + (length(t) - length(replace(t, ' et ', ''))) / 4 + (length(t) - length(replace(t, ' est ', ''))) / 5
        |      + (length(t) - length(replace(t, ' les ', ''))) / 5 AS s_fr,
        |    (length(t) - length(replace(t, ' el ', ''))) / 4 + (length(t) - length(replace(t, ' la ', ''))) / 4
        |      + (length(t) - length(replace(t, ' y ', ''))) / 3 + (length(t) - length(replace(t, ' es ', ''))) / 4
        |      + (length(t) - length(replace(t, ' los ', ''))) / 5 AS s_es,
        |    (length(t) - length(replace(t, '的', ''))) / 1 + (length(t) - length(replace(t, '是', ''))) / 1
        |      + (length(t) - length(replace(t, '了', ''))) / 1 + (length(t) - length(replace(t, '在', ''))) / 1
        |      + (length(t) - length(replace(t, '我', ''))) / 1 AS s_zh
        |  FROM p)
        |SELECT doc_id, lang,
        |  CASE WHEN greatest(s_de, s_en, s_es, s_fr, s_zh) <= 0 THEN 'und'
        |       WHEN s_zh = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'zh'
        |       WHEN s_fr = greatest(s_de, s_en, s_es, s_fr) THEN 'fr'
        |       WHEN s_es = greatest(s_de, s_en, s_es) THEN 'es'
        |       WHEN s_en = greatest(s_de, s_en) THEN 'en'
        |       ELSE 'de' END AS lang_guess
        |FROM scored ORDER BY doc_id""".stripMargin,

    "x_quality" ->
      """WITH base AS (
        |  SELECT doc_id, length(text) AS len,
        |    CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
        |      / greatest(CAST(length(text) AS DOUBLE), 1.0) AS alpha,
        |    CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS DOUBLE)
        |      / greatest(CAST(length(text) AS DOUBLE), 1.0) AS punct,
        |    CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      x -> x IN ('the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','was','at','by','be','this'))) AS DOUBLE)
        |      / greatest(CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS DOUBLE), 1.0) AS stop
        |  FROM documents),
        |parts AS (
        |  SELECT doc_id,
        |    CASE WHEN len BETWEEN 50 AND 100000 THEN 1.0 WHEN len BETWEEN 10 AND 49 THEN 0.5 ELSE 0.0 END AS len_ok,
        |    CASE WHEN alpha >= 0.6 THEN 1.0 WHEN alpha >= 0.3 THEN 0.5 ELSE 0.0 END AS alpha_ok,
        |    CASE WHEN punct <= 0.2 THEN 1.0 ELSE 0.0 END AS punct_ok,
        |    CASE WHEN stop >= 0.05 THEN 1.0 ELSE 0.0 END AS stop_ok
        |  FROM base)
        |SELECT doc_id, round(len_ok * 0.3 + alpha_ok * 0.3 + punct_ok * 0.2 + stop_ok * 0.2, 2) AS quality
        |FROM parts ORDER BY doc_id""".stripMargin,

    "x_text_stats" ->
      """SELECT doc_id,
        |  CASE WHEN length(trim(text)) = 0 THEN 0
        |       ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER) END AS n_tokens,
        |  CAST(length(text) AS INTEGER) AS n_chars_m,
        |  round(CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
        |        / greatest(CAST(length(text) AS DOUBLE), 1.0), 6) AS alpha_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,

    // ln matches Java bit-for-bit; the mean accumulates ln values in
    // DECIMAL on both sides (partial-agg order independence)
    "x_unigram_logprob" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        |  FROM documents),
        |tk AS (SELECT doc_id, term FROM tok WHERE term <> ''),
        |c AS (SELECT term, count(*) AS cnt FROM tk GROUP BY term),
        |t AS (SELECT sum(cnt) AS total FROM c),
        |j AS (
        |  SELECT tk.doc_id, ln(CAST(c.cnt AS DOUBLE) / CAST(t.total AS DOUBLE)) AS lnp
        |  FROM tk JOIN c USING (term), t),
        |per AS (
        |  SELECT doc_id, count(*) AS n_tokens,
        |    round(CAST(sum(CAST(lnp AS DECIMAL(28,12))) AS DOUBLE) / count(*), 6) AS mean_lnp
        |  FROM j GROUP BY doc_id)
        |SELECT d.doc_id AS id, CAST(coalesce(per.n_tokens, 0) AS BIGINT) AS n_tokens,
        |  per.mean_lnp
        |FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
        |ORDER BY id""".stripMargin,

    // smoothed TF-IDF replay — ln() matches Java's bit-for-bit (proven
    // by the bm25 oracle); ties rank by term on both sides
    "x_keyterms" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok WHERE term <> '' GROUP BY doc_id, term),
        |d AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |s AS (
        |  SELECT tf.doc_id, tf.term,
        |    tf.tf * ln((n.n_docs + 1.0) / (d.df + 1.0)) AS score
        |  FROM tf JOIN d USING (term), n),
        |r AS (
        |  SELECT doc_id, term, score,
        |    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS INTEGER) AS rank
        |  FROM s)
        |SELECT doc_id, term, round(score, 6) AS score, rank
        |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    // full Gopher-rule replay: same tokenizer, same regex counters
    // (RE2-safe patterns — identical counts under Java regex and RE2)
    "x_gopher_filter" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> t <> '')) AS BIGINT) AS n_words,
        |    length(regexp_replace(text, '\s', '', 'g')) AS nsc,
        |    length(text) - length(replace(text, '#', '')) AS hashes,
        |    CAST(length(text) - length(replace(text, '...', '')) AS DOUBLE) / 3
        |      + (length(text) - length(replace(text, '…', ''))) AS ells,
        |    len(string_split(text, chr(10))) AS n_lines,
        |    len(regexp_extract_all(text, '(^|\n)[ \t]*[-•*]')) AS bullet_lines,
        |    len(regexp_extract_all(text, '(\.\.\.|…)[ \t]*(\n|$)')) AS ell_lines,
        |    len(regexp_extract_all(text, '(^|\s)\S*\p{L}\S*')) AS alpha_words,
        |    CAST(len(list_intersect(
        |      list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> t <> ''),
        |      ['the','be','to','of','and','that','have','with'])) AS BIGINT) AS stop_hits
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, n_words,
        |    CASE WHEN n_words > 0 THEN CAST(nsc AS DOUBLE) / n_words END AS mean_word_len,
        |    CASE WHEN n_words > 0 THEN (hashes + ells) / n_words END AS symbol_ratio,
        |    CAST(bullet_lines AS DOUBLE) / n_lines AS bullet_frac,
        |    CAST(ell_lines AS DOUBLE) / n_lines AS ellipsis_frac,
        |    CASE WHEN n_words > 0 THEN CAST(alpha_words AS DOUBLE) / n_words END AS alpha_word_frac,
        |    stop_hits
        |  FROM m)
        |SELECT doc_id, n_words, round(mean_word_len, 6) AS mean_word_len,
        |  round(symbol_ratio, 6) AS symbol_ratio,
        |  round(bullet_frac, 6) AS bullet_frac,
        |  round(ellipsis_frac, 6) AS ellipsis_frac,
        |  round(alpha_word_frac, 6) AS alpha_word_frac, stop_hits,
        |  coalesce(n_words BETWEEN 50 AND 100000
        |    AND mean_word_len BETWEEN 3 AND 10 AND symbol_ratio < 0.1
        |    AND bullet_frac < 0.9 AND ellipsis_frac < 0.3
        |    AND alpha_word_frac > 0.8 AND stop_hits >= 2, false) AS passes
        |FROM r ORDER BY doc_id""".stripMargin,

    "x_vocab_topk" ->
      """WITH w AS (
        |  SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
        |  FROM documents),
        |c AS (SELECT word, count(*) AS cnt FROM w WHERE word <> '' GROUP BY word),
        |t AS (SELECT sum(cnt) AS total FROM c),
        |r AS (
        |  SELECT word, cnt,
        |    CAST(row_number() OVER (ORDER BY cnt DESC, word) AS INTEGER) AS rank,
        |    sum(cnt) OVER (ORDER BY cnt DESC, word ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM c)
        |SELECT word, cnt, rank,
        |  round(CAST(cum AS DOUBLE) / CAST(t.total AS DOUBLE), 6) AS cum_frac
        |FROM r, t WHERE rank <= 100 ORDER BY rank""".stripMargin,

    // window strings stand in for the engine's window hashes
    // (count-equivalent, as in x_repetition)
    "x_dup_passages" ->
      """WITH d AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]
        |            FOR i IN range(1, len(w) - 3)]) AS s
        |  FROM d),
        |df AS (SELECT s, count(DISTINCT doc_id) AS ndocs FROM sh GROUP BY s),
        |per AS (
        |  SELECT sh.doc_id, count(*) AS n_windows,
        |    sum(CASE WHEN df.ndocs > 1 THEN 1 ELSE 0 END) AS n_dup_windows
        |  FROM sh JOIN df ON sh.s = df.s GROUP BY sh.doc_id)
        |SELECT doc.doc_id AS id,
        |  CAST(coalesce(per.n_windows, 0) AS BIGINT) AS n_windows,
        |  CAST(coalesce(per.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
        |  round(CAST(per.n_dup_windows AS DOUBLE) / per.n_windows, 6) AS dup_frac
        |FROM documents doc LEFT JOIN per ON doc.doc_id = per.doc_id
        |ORDER BY id""".stripMargin,

    // full surgical replay: windows and tokens with positions (struct
    // comprehensions), covered positions fan out 0..4, survivors
    // re-aggregate in position order
    "x_dup_passages_removed" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS ot,
        |    string_split_regex(lower(trim(text)), '\s+') AS w
        |  FROM documents),
        |wins AS (
        |  SELECT doc_id, u.p AS wpos, u.s FROM (
        |    SELECT doc_id, unnest([{'p': i - 1, 's': w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4]}
        |                           FOR i IN range(1, len(w) - 3)]) AS u
        |    FROM d)),
        |duph AS (
        |  SELECT s FROM (SELECT s, count(DISTINCT doc_id) AS df FROM wins GROUP BY s) WHERE df >= 2),
        |covered AS (
        |  SELECT DISTINCT wins.doc_id, wins.wpos + o.o AS pos
        |  FROM wins JOIN duph USING (s), unnest([0,1,2,3,4]) AS o(o)),
        |toks AS (
        |  SELECT doc_id, u.p AS pos, u.t FROM (
        |    SELECT doc_id, unnest([{'p': i - 1, 't': ot[i]} FOR i IN range(1, len(ot) + 1)]) AS u
        |    FROM d)),
        |kept AS (
        |  SELECT t.doc_id, t.pos, t.t FROM toks t
        |  LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.pos = c.pos
        |  WHERE c.pos IS NULL),
        |reb AS (
        |  SELECT doc_id, string_agg(t, ' ' ORDER BY pos) AS clean_text,
        |    count(*) AS n_kept FROM kept GROUP BY doc_id)
        |SELECT d.doc_id AS id, coalesce(reb.clean_text, '') AS clean_text,
        |  CAST(coalesce(reb.n_kept, 0) AS BIGINT) AS n_kept_tokens
        |FROM d LEFT JOIN reb ON d.doc_id = reb.doc_id
        |ORDER BY id""".stripMargin,

    // store windows replayed as strings (count-equivalent, as in
    // x_dup_passages); a batch window is dup if it's in the store or
    // in another batch doc
    "x_dup_passages_incr" ->
      """WITH d AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
        |  FROM documents),
        |sw AS (
        |  SELECT DISTINCT s FROM (
        |    SELECT unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]
        |                   FOR i IN range(1, len(w) - 3)]) AS s
        |    FROM d WHERE doc_id < 200)),
        |bw AS (
        |  SELECT doc_id,
        |    unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]
        |            FOR i IN range(1, len(w) - 3)]) AS s
        |  FROM d WHERE doc_id >= 200 AND doc_id < 300),
        |bdf AS (SELECT s, count(DISTINCT doc_id) AS bdocs FROM bw GROUP BY s),
        |per AS (
        |  SELECT bw.doc_id, count(*) AS n_windows,
        |    sum(CASE WHEN sw.s IS NOT NULL OR bdf.bdocs > 1 THEN 1 ELSE 0 END) AS n_dup
        |  FROM bw JOIN bdf ON bw.s = bdf.s LEFT JOIN sw ON bw.s = sw.s
        |  GROUP BY bw.doc_id)
        |SELECT doc.doc_id AS id,
        |  CAST(coalesce(per.n_windows, 0) AS BIGINT) AS n_windows,
        |  CAST(coalesce(per.n_dup, 0) AS BIGINT) AS n_dup_windows,
        |  round(CAST(per.n_dup AS DOUBLE) / per.n_windows, 6) AS dup_frac
        |FROM (SELECT doc_id FROM documents WHERE doc_id >= 200 AND doc_id < 300) doc
        |LEFT JOIN per ON doc.doc_id = per.doc_id
        |ORDER BY id""".stripMargin,

    // the z-probe must be SEMANTICALLY the box filter — the oracle is
    // the box filter itself, no z replay needed
    "x_zrange_scan" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
        |WHERE o_custkey BETWEEN 100 AND 299
        |  AND datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) BETWEEN 1200 AND 2399
        |ORDER BY o_orderkey""".stripMargin,

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

    // three-way interleave replay: bit i of column k at position 3i+k
    "x_zorder3" ->
      """SELECT o_orderkey,
        |  CAST(list_sum(list_transform(range(0, 16), i ->
        |    (((CAST(o_custkey AS BIGINT) >> i) & 1) << (3*i))
        |    + (((CAST(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) >> i) & 1) << (3*i+1))
        |    + (((CAST(substring(o_orderpriority, 1, 1) AS BIGINT) >> i) & 1) << (3*i+2))
        |  )) AS BIGINT) AS zval
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    // bit-for-bit Morton replay: even bits custkey, odd bits day index
    "x_zorder_layout" ->
      """SELECT o_orderkey,
        |  CAST(list_sum(list_transform(range(0, 31), i ->
        |    (((CAST(o_custkey AS BIGINT) >> i) & 1) << (2*i))
        |    + (((CAST(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) >> i) & 1) << (2*i+1))
        |  )) AS BIGINT) AS zval
        |FROM orders ORDER BY o_orderkey""".stripMargin,

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

    "q_rollup_maintain" ->
      """SELECT CAST(make_timestamp(epoch_ns(ts) // 1000) AS DATE) AS day,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v_sum
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_quantile_bins" -> {
      val qs = (1 until 10).map(i => i / 10.0).mkString(",")
      val caseSum = (1 to 9)
        .map(i => s"(CASE WHEN value > edges[$i] THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH e AS (SELECT event_id, value FROM events),
         |ed AS (SELECT quantile_cont(value, [$qs]) AS edges FROM e),
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

    // the oracle replays the kernel's exact left-to-right double
    // accumulation (list_transform + list_sum), so the threshold
    // decision is bit-identical — same pattern as x_embed_neardup
    // bigram-LM replay: same lowercased shingles, c(w1 w2)/c(w1·) MLE,
    // ln rounded to 9 before the decimal mean
    "x_bigram_lp" ->
      """WITH d AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w FROM documents),
        |bg AS (
        |  SELECT doc_id, unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS b
        |  FROM d),
        |cb AS (SELECT b, count(*) AS cb FROM bg GROUP BY b),
        |cu AS (SELECT string_split(b, ' ')[1] AS w1, count(*) AS cu FROM bg GROUP BY 1),
        |t AS (
        |  SELECT bg.doc_id, round(ln(CAST(cb.cb AS DOUBLE) / cu.cu), 9) AS term
        |  FROM bg JOIN cb ON bg.b = cb.b
        |  JOIN cu ON string_split(bg.b, ' ')[1] = cu.w1)
        |SELECT doc_id AS id, count(*) AS n_bigrams,
        |  round(CAST(sum(CAST(term AS DECIMAL(20,9))) AS DOUBLE) / count(*), 6) AS mean_lp
        |FROM t GROUP BY doc_id ORDER BY id""".stripMargin,

    // chunk-boundary replay: same whitespace split, same integer chunk
    // count, same 1-based 40-token slices at stride 30
    "x_chunks" ->
      s"""WITH d AS (
         |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
         |  FROM documents WHERE length(trim(text)) > 0),
         |n AS (SELECT doc_id, w, len(w) AS n FROM d),
         |k AS (
         |  SELECT doc_id, w, n,
         |    CASE WHEN n <= 40 THEN 1 ELSE 1 + (n - 40 + 29) // 30 END AS nk
         |  FROM n),
         |ch AS (SELECT doc_id, w, unnest(range(0, nk)) AS chunk_id FROM k),
         |sl AS (
         |  SELECT doc_id, chunk_id,
         |    w[chunk_id * 30 + 1 : chunk_id * 30 + 40] AS cw
         |  FROM ch),
         |o AS (
         |  SELECT doc_id, chunk_id, CAST(len(cw) AS BIGINT) AS n_tok,
         |    ${fnvSql("(array_to_string(cw, ' '))")} AS hu
         |  FROM sl)
         |SELECT doc_id, chunk_id, n_tok, ${signedSql("hu")} AS chunk_fnv
         |FROM o ORDER BY doc_id, chunk_id""".stripMargin,

    // k-means single-Lloyd-step replay: FNV cell seeding (8 | 2⁶⁴, so
    // unsigned %8 == Spark's signed pmod), engine-agnostic centroid
    // means, same kernel accumulation order as the engine's zip_with
    // fold, same (cos desc, cell asc) tie-break
    "x_kmeans" ->
      s"""WITH e AS (SELECT vec_id, embedding AS v FROM embeddings),
        |cells AS (
        |  SELECT CAST(${fnvSql("(CAST(vec_id AS VARCHAR))")} % 8 AS BIGINT) AS cell, v FROM e),
        |d AS (
        |  SELECT cell, unnest([{'dim': i, 'x': CAST(v[i] AS DOUBLE)} FOR i IN range(1, len(v) + 1)]) AS s
        |  FROM cells),
        |dx AS (SELECT cell, s.dim AS dim, s.x AS x FROM d),
        |cent AS (
        |  SELECT cell, dim, round(CAST(sum(CAST(x AS DECIMAL(28,10))) AS DOUBLE) / count(*), 9) AS m
        |  FROM dx GROUP BY cell, dim),
        |centv AS (SELECT cell, list(m ORDER BY dim) AS c FROM cent GROUP BY cell),
        |scored AS (
        |  SELECT e.vec_id, centv.cell,
        |    round(
        |      list_sum(list_transform(range(1, len(e.v) + 1), i -> CAST(e.v[i] AS DOUBLE) * centv.c[i]))
        |      / (sqrt(list_sum(list_transform(range(1, len(e.v) + 1), i -> CAST(e.v[i] AS DOUBLE) * CAST(e.v[i] AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(range(1, len(centv.c) + 1), i -> centv.c[i] * centv.c[i])))), 6) AS cos
        |  FROM e, centv),
        |assigned AS (
        |  SELECT vec_id, cell, cos,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell ASC) AS rn
        |  FROM scored)
        |SELECT cell, count(*) AS n,
        |  round(CAST(sum(CAST(cos AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_cos
        |FROM assigned WHERE rn = 1 GROUP BY cell ORDER BY cell""".stripMargin,

    "x_decontaminate_semantic" ->
      """WITH e AS (SELECT vec_id, embedding AS v FROM embeddings),
        |b AS (SELECT v FROM e WHERE vec_id % 100 = 0),
        |c AS (SELECT vec_id, v FROM e WHERE vec_id % 100 != 0),
        |scored AS (
        |  SELECT c.vec_id,
        |    max(list_sum(list_transform(range(1, len(c.v) + 1), i -> CAST(c.v[i] AS DOUBLE) * CAST(b.v[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(range(1, len(c.v) + 1), i -> CAST(c.v[i] AS DOUBLE) * CAST(c.v[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(range(1, len(b.v) + 1), i -> CAST(b.v[i] AS DOUBLE) * CAST(b.v[i] AS DOUBLE)))))) AS mc
        |  FROM c, b GROUP BY c.vec_id)
        |SELECT vec_id, round(mc, 6) AS max_benchmark_cos
        |FROM scored WHERE mc >= 0.30 ORDER BY vec_id""".stripMargin,

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

    // exact regime: err is identically 0 and counts are true counts
    "x_heavy_hitters" ->
      """WITH c AS (SELECT event_type AS key, count(*) AS n FROM events GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
        |SELECT c.key, c.n, CAST(0 AS BIGINT) AS err, t.total
        |FROM c, t ORDER BY c.n DESC, c.key""".stripMargin,

    "x_fuzzy_join" ->
      """WITH p AS (
        |  SELECT p_partkey, concat(p_name, '-', p_partkey) AS ename FROM part),
        |dirty AS (
        |  SELECT p_partkey AS dirty_key,
        |    concat(substr(ename, 1, CAST(p_partkey % 5 + 1 AS INTEGER)),
        |           substr(ename, CAST(p_partkey % 5 + 3 AS INTEGER))) AS dname
        |  FROM p WHERE p_partkey % 3 = 0),
        |clean AS (SELECT p_partkey AS clean_key, ename FROM p)
        |SELECT dirty_key, clean_key, dname, ename,
        |  CAST(levenshtein(dname, ename) AS INTEGER) AS dist
        |FROM dirty, clean
        |WHERE abs(length(dname) - length(ename)) <= 1
        |  AND levenshtein(dname, ename) <= 1
        |ORDER BY dirty_key, clean_key""".stripMargin,

    // content checksum over the ORIGINAL table — must equal the
    // engine's checksum of the compacted rewrite
    "x_compact" ->
      s"""SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
         |  CAST(sum((((${signedSql("hu")} % 1000000) + 1000000) % 1000000)) AS BIGINT) AS text_fnv_sum,
         |  CAST(sum(n_chars) AS BIGINT) AS chars_sum,
         |  TRUE AS compacted
         |FROM (SELECT doc_id, n_chars, ${fnvSql("text")} AS hu FROM documents)""".stripMargin,

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
        |FROM ch ORDER BY user_id, valid_from, event_type""".stripMargin,

    // replay of the priority order: pri = w / ((fnvBucket+1)/10⁶)
    "x_sample_weighted" ->
      s"""WITH h AS (
         |  SELECT doc_id, lang, n_chars,
         |    ${fnvSql("(coalesce(CAST(doc_id AS VARCHAR), chr(0) || 'null') || ':7')")} AS hu
         |  FROM documents),
         |p AS (
         |  SELECT doc_id, lang, n_chars,
         |    CAST(n_chars AS DOUBLE)
         |      / (CAST((((${signedSql("hu")} % 1000000) + 1000000) % 1000000) + 1 AS DOUBLE) / 1000000.0) AS pri
         |  FROM h)
         |SELECT doc_id, lang, n_chars FROM
         |  (SELECT * FROM p ORDER BY pri DESC, doc_id LIMIT 100)
         |ORDER BY doc_id""".stripMargin
  )
}
