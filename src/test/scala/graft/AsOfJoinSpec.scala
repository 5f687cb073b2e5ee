package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions.col

import graft.ops.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofBackward picks the latest right row at or before each left ts") {
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:05"), 100.0),
      (1L, ts("2024-01-01 10:00:30"), 101.0),
      (1L, ts("2024-01-01 09:59:00"), 99.0), // before any quote
      (2L, ts("2024-01-01 10:00:10"), 200.0)
    ).toDF("sym", "t_ts", "trade_px")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 50.0),
      (1L, ts("2024-01-01 10:00:30"), 51.0), // exactly simultaneous with a trade
      (2L, ts("2024-01-01 10:00:09"), 60.0)
    ).toDF("sym", "q_ts", "quote_px")

    val out = AsOfJoin.asofBackward(trades, quotes, "sym", "t_ts", "q_ts", Seq("quote_px"))
      .orderBy("sym", "t_ts")
      .as[(Long, Timestamp, Double, Option[Double])].collect()
    assert(out === Array(
      (1L, ts("2024-01-01 09:59:00"), 99.0, None),       // no quote yet -> null
      (1L, ts("2024-01-01 10:00:05"), 100.0, Some(50.0)),
      (1L, ts("2024-01-01 10:00:30"), 101.0, Some(51.0)), // equal ts matches
      (2L, ts("2024-01-01 10:00:10"), 200.0, Some(60.0))))
  }

  test("asofForward picks the earliest right row at or after each left ts") {
    val l = Seq((1L, 10L), (1L, 16L), (1L, 99L)).toDF("k", "lt")
    val r = Seq((1L, 12L, "a"), (1L, 16L, "b"), (1L, 30L, "c")).toDF("k", "rt", "s")
    val out = AsOfJoin.asofForward(l, r, "k", "lt", "rt", Seq("s"))
      .orderBy("lt").as[(Long, Long, Option[String])].collect()
    assert(out === Array(
      (1L, 10L, Some("a")),  // next reading after 10 is 12
      (1L, 16L, Some("b")),  // equal ts matches
      (1L, 99L, None)))      // nothing after 99
  }

  test("null timestamps: null-ts left rows match nothing in BOTH directions; null-ts right rows are ignored") {
    val l = Seq((1L, Option(20L)), (1L, Option.empty[Long])).toDF("k", "lt")
    val r = Seq(
      (1L, Option(10L), "a"),
      (1L, Option.empty[Long], "ghost") // unstamped reading: must never match
    ).toDF("k", "rt", "s")
    val back = AsOfJoin.asofBackward(l, r, "k", "lt", "rt", Seq("s"))
      .orderBy(col("lt").asc_nulls_first).as[(Long, Option[Long], Option[String])].collect()
    assert(back === Array((1L, None, None), (1L, Some(20L), Some("a"))))
    val fwd = AsOfJoin.asofForward(l, r, "k", "lt", "rt", Seq("s"))
      .orderBy(col("lt").asc_nulls_first).as[(Long, Option[Long], Option[String])].collect()
    // 20L has no reading at-or-after it; the null-ts left row matches
    // nothing (symmetric with backward — was the asymmetry bug)
    assert(fwd === Array((1L, None, None), (1L, Some(20L), None)))
  }

  test("asofBackward keeps payload rows atomic when fields are null") {
    val l = Seq((1L, 20L)).toDF("k", "lt")
    val r = Seq(
      (1L, 10L, Option("a"), Option(1.0)),
      (1L, 15L, Option.empty[String], Option(5.0)) // later row, null field
    ).toDF("k", "rt", "s", "v")
    val out = AsOfJoin.asofBackward(l, r, "k", "lt", "rt", Seq("s", "v"))
      .as[(Long, Long, Option[String], Option[Double])].collect()
    // must be the 15L row VERBATIM (s=null, v=5.0) — not s="a" carried
    // over from the older row
    assert(out === Array((1L, 20L, None, Some(5.0))))
  }

  test("tolerance composition: stale matches null out, fresh ones survive") {
    import org.apache.spark.sql.functions._
    // carry the matched right ts as payload, then guard freshness —
    // the q_asof_tolerance shape
    val l = Seq((1L, 100L), (1L, 200L)).toDF("k", "lt")
    val r = Seq((1L, 95L, "fresh-for-100"), (1L, 120L, "stale-for-200"))
      .toDF("k", "rt", "s")
      .withColumn("mrt", col("rt"))
    val out = AsOfJoin.asofBackward(l, r, "k", "lt", "rt", Seq("s", "mrt"))
      .select(col("k"), col("lt"),
        when(col("mrt") >= col("lt") - 10L, col("s")).as("s_fresh"))
      .orderBy("lt").as[(Long, Long, Option[String])].collect()
    // lt=100 matches rt=95 (age 5 ≤ 10: kept); lt=200 matches rt=120
    // (age 80 > 10: nulled, not dropped)
    assert(out === Array((1L, 100L, Some("fresh-for-100")), (1L, 200L, None)))
  }

  test("asofBackward carries multiple payload columns and respects keys") {
    val l = Seq((1L, 10L), (1L, 20L), (2L, 15L)).toDF("k", "lt")
    val r = Seq((1L, 5L, "a", 1.0), (1L, 15L, "b", 2.0), (3L, 1L, "x", 9.0))
      .toDF("k", "rt", "s", "v")
    val out = AsOfJoin.asofBackward(l, r, "k", "lt", "rt", Seq("s", "v"))
      .orderBy("k", "lt")
      .as[(Long, Long, Option[String], Option[Double])].collect()
    assert(out === Array(
      (1L, 10L, Some("a"), Some(1.0)),
      (1L, 20L, Some("b"), Some(2.0)),
      (2L, 15L, None, None))) // key 2 has no right rows; key 3 unused
  }

  // ——— native custom-plan operator (graft.plans.AsOfJoinExec) ———

  test("asofNative plans the custom operator (AsOfJoinExec in the physical plan)") {
    val l = Seq((1L, 10L), (2L, 20L)).toDF("k", "lt")
    val r = Seq((1L, 5L, "a")).toDF("k", "rt", "s")
    val df = AsOfJoin.asofNative(l, r, "k", "lt", "rt", Seq("s"))
    // nodeName strips the Exec suffix: the custom operator renders as
    // "AsOfJoin [keys...]" above the two ENSURE_REQUIREMENTS exchanges
    assert(df.queryExecution.executedPlan.toString.contains("AsOfJoin "),
      s"expected the AsOfJoinExec node in:\n${df.queryExecution.executedPlan}")
    // and it still answers correctly through the exchange+sort requirements
    assert(df.orderBy("k").as[(Long, Long, Option[String])].collect() ===
      Array((1L, 10L, Some("a")), (2L, 20L, None)))
  }

  test("asofNative matches the window composition row-for-row (randomized, both directions)") {
    val rnd = new scala.util.Random(4242)
    // keys with: no right rows (7), only right rows (8), heavy overlap,
    // duplicate left timestamps, null ts on both sides
    val lRows = Seq.tabulate(400) { i =>
      val k = 1L + rnd.nextInt(7)
      val t = if (rnd.nextInt(20) == 0) None else Some(rnd.nextInt(1000).toLong)
      (k, t, i.toLong)
    }
    val rRows = Seq.tabulate(300) { i =>
      val k = 2L + rnd.nextInt(7) // 8 exists only on the right
      val t = if (rnd.nextInt(20) == 0) None else Some(rnd.nextInt(1000).toLong)
      (k, t, s"p$i")
    }
    // right side must be unique per (key, ts) — the operator contract
    val l = lRows.toDF("k", "lt", "lid")
    val r = rRows.toDF("k", "rt", "s")
      .groupBy("k", "rt").agg(org.apache.spark.sql.functions.max("s").as("s"))
    for (fwd <- Seq(false, true)) {
      val viaWindow =
        (if (fwd) AsOfJoin.asofForward(l, r, "k", "lt", "rt", Seq("s"))
         else AsOfJoin.asofBackward(l, r, "k", "lt", "rt", Seq("s")))
          .orderBy("lid").as[(Long, Option[Long], Long, Option[String])].collect()
      val viaNative = AsOfJoin.asofNative(l, r, "k", "lt", "rt", Seq("s"), forward = fwd)
        .orderBy("lid").as[(Long, Option[Long], Long, Option[String])].collect()
      assert(viaNative === viaWindow, s"direction forward=$fwd diverged")
    }
  }

  test("asofNative: atomic payload, equal-ts match, self-lineage right side") {
    // same shape as the composition's atomic-payload test
    val l = Seq((1L, 20L)).toDF("k", "lt")
    val r = Seq(
      (1L, 10L, Option("a"), Option(1.0)),
      (1L, 15L, Option.empty[String], Option(5.0))).toDF("k", "rt", "s", "v")
    val out = AsOfJoin.asofNative(l, r, "k", "lt", "rt", Seq("s", "v"))
      .as[(Long, Long, Option[String], Option[Double])].collect()
    assert(out === Array((1L, 20L, None, Some(5.0))))
    // right side derived from the left (shared lineage/exprIds) — the
    // registered query's shape; the fresh-alias projection must keep
    // the sides distinct
    val ev = Seq((1L, 10L, 1.0), (1L, 20L, 2.0), (1L, 30L, 3.0)).toDF("k", "lt", "v")
    val ref = ev.filter(col("lt") % 20 === 0)
      .select(col("k"), col("lt").as("rt"), col("v").as("rv"))
    val out2 = AsOfJoin.asofNative(ev, ref, "k", "lt", "rt", Seq("rv"))
      .orderBy("lt").as[(Long, Long, Double, Option[Double])].collect()
    assert(out2 === Array(
      (1L, 10L, 1.0, None),
      (1L, 20L, 2.0, Some(2.0)), // equal ts matches
      (1L, 30L, 3.0, Some(2.0))))
  }

  test("left-only filters push below the custom node (and results are unchanged)") {
    // parquet-backed left so pushdown is visible at the scan
    val dir = java.nio.file.Files.createTempDirectory("graft_asof_push").toString
    Seq((1L, 10L, 5.0), (1L, 20L, 6.0), (2L, 30L, 7.0), (2L, 40L, 8.0))
      .toDF("k", "lt", "v").write.mode("overwrite").parquet(dir)
    val l = spark.read.parquet(dir)
    val r = Seq((1L, 15L, "a"), (2L, 35L, "b")).toDF("k", "rt", "s")
    val joined = AsOfJoin.asofNative(l, r, "k", "lt", "rt", Seq("s"))
      .filter(col("v") > 6.5) // references only left columns
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(v), GreaterThan(v,6.5)]"),
      s"left filter did not reach the scan:\n$plan")
    // a payload-referencing filter must NOT push (it would change matches)
    val guarded = AsOfJoin.asofNative(l, r, "k", "lt", "rt", Seq("s"))
      .filter(col("s") === "b")
    val gPlan = guarded.queryExecution.optimizedPlan.toString
    assert(gPlan.indexOf("Filter") < gPlan.indexOf("AsOfJoin"),
      s"payload filter must stay above the node:\n$gPlan")
    // semantics unchanged by the pushdown
    assert(joined.orderBy("k", "lt").as[(Long, Long, Double, Option[String])]
      .collect() === Array(
        (2L, 30L, 7.0, None),
        (2L, 40L, 8.0, Some("b"))))
    assert(guarded.as[(Long, Long, Double, Option[String])].collect() ===
      Array((2L, 40L, 8.0, Some("b"))))
  }

  test("projections prune the left scan through the custom node") {
    val dir = java.nio.file.Files.createTempDirectory("graft_asof_prune").toString
    Seq((1L, 10L, 5.0, "wide1", "wide2"), (2L, 30L, 7.0, "wide1", "wide2"))
      .toDF("k", "lt", "v", "w1", "w2").write.mode("overwrite").parquet(dir)
    val l = spark.read.parquet(dir)
    val r = Seq((1L, 5L, "a")).toDF("k", "rt", "s")
    val narrow = AsOfJoin.asofNative(l, r, "k", "lt", "rt", Seq("s"))
      .select("k", "s") // w1/w2/v/lt unused beyond the node's own needs
    val plan = narrow.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<k:bigint,lt:bigint>"),
      s"left scan not pruned to (key, ts):\n$plan")
    assert(narrow.orderBy("k").as[(Long, Option[String])].collect() ===
      Array((1L, Some("a")), (2L, None)))
  }

  test("asofNativeKeys: composite keys match the single-concatenated-key reduction") {
    val rnd = new scala.util.Random(1234)
    val l = Seq.tabulate(300)(i =>
      (1L + rnd.nextInt(3), s"r${rnd.nextInt(3)}", rnd.nextInt(500).toLong, i.toLong))
      .toDF("k1", "k2", "lt", "lid")
    val r = Seq.tabulate(200)(i =>
      (1L + rnd.nextInt(3), s"r${rnd.nextInt(3)}", rnd.nextInt(500).toLong, s"p$i"))
      .toDF("k1", "k2", "rt", "s")
      .groupBy("k1", "k2", "rt").agg(org.apache.spark.sql.functions.max("s").as("s"))
    val viaPair = AsOfJoin.asofNativeKeys(l, r, Seq("k1", "k2"), "lt", "rt", Seq("s"))
      .orderBy("lid").as[(Long, String, Long, Long, Option[String])].collect().toSeq
    // reduction: the same join on a fused key through the window form
    // (keys are tiny fixed-width here, so concatenation is injective)
    val lf = l.withColumn("kk",
      org.apache.spark.sql.functions.concat_ws("|", col("k1"), col("k2")))
    val rf = r.withColumn("kk",
      org.apache.spark.sql.functions.concat_ws("|", col("k1"), col("k2")))
      .select("kk", "rt", "s")
    val viaFused = AsOfJoin.asofBackward(lf, rf, "kk", "lt", "rt", Seq("s"))
      .orderBy("lid").select("k1", "k2", "lt", "lid", "s")
      .as[(Long, String, Long, Long, Option[String])].collect().toSeq
    assert(viaPair === viaFused)
  }
}
