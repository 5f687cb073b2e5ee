package graft

import org.apache.spark.sql.functions._

import graft.ops.TimeSeries

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  test("resample fills gap slots with null mean and n=0") {
    // key a: observations at slots 0, 0, 300 (gap at 100, 200 with step 100)
    val df = Seq(
      ("a", 10L, 1.0), ("a", 95L, 3.0), ("a", 310L, 5.0),
      ("b", 1000L, 7.0)
    ).toDF("k", "ts", "v")
    val out = TimeSeries.resample(df, "k", "ts", "v", 100L)
      .orderBy("k", "slot").collect()
    val rows = out.map(r => (r.getString(0), r.getLong(1),
      if (r.isNullAt(2)) null else r.getDouble(2), r.getLong(3))).toSeq
    assert(rows == Seq(
      ("a", 0L, 2.0, 2L),      // mean of 1.0, 3.0
      ("a", 100L, null, 0L),
      ("a", 200L, null, 0L),
      ("a", 300L, 5.0, 1L),
      ("b", 1000L, 7.0, 1L)))  // single-slot key: spine is that slot
  }

  test("resample spine is per-key, not a global calendar") {
    val df = Seq(("a", 0L, 1.0), ("b", 100000L, 2.0)).toDF("k", "ts", "v")
    val out = TimeSeries.resample(df, "k", "ts", "v", 100L)
    // b must NOT get slots from a's range or vice versa
    assert(out.count() == 2)
  }

  test("resample guards runaway spans") {
    val df = Seq(("a", 0L, 1.0), ("a", 10000000L, 2.0)).toDF("k", "ts", "v")
    val e = intercept[Exception] {
      TimeSeries.resample(df, "k", "ts", "v", 1L, maxSlotsPerKey = 1000L).count()
    }
    assert(e.getMessage != null)
  }

  test("forwardFill carries the latest non-null forward, per key") {
    val df = Seq(
      ("a", 1L, Some(1.0)), ("a", 2L, None), ("a", 3L, None), ("a", 4L, Some(4.0)),
      ("b", 1L, None), ("b", 2L, Some(9.0))
    ).toDF("k", "t", "v")
    val out = TimeSeries.forwardFill(df, "k", "t", Seq("v"))
      .orderBy("k", "t").collect()
      .map(r => if (r.isNullAt(2)) null else r.getDouble(2)).toSeq
    assert(out == Seq(1.0, 1.0, 1.0, 4.0, null, 9.0))
  }

  test("interpolateLinear draws the line between neighbors") {
    val df = Seq(
      ("a", 0L, Some(0.0)), ("a", 10L, None), ("a", 20L, None), ("a", 30L, Some(3.0)),
      ("a", 40L, Some(8.0)),
      // edges: leading null has no prev, stays null
      ("b", 0L, None), ("b", 10L, Some(1.0)), ("b", 20L, None)
    ).toDF("k", "t", "v")
    val out = TimeSeries.interpolateLinear(df, "k", "t", "v")
      .orderBy("k", "t").collect()
      .map(r => if (r.isNullAt(2)) null else r.getDouble(2)).toSeq
    assert(out == Seq(0.0, 1.0, 2.0, 3.0, 8.0, null, 1.0, null))
  }

  test("rollingAnomalies flags a planted spike against the trailing baseline") {
    // steady 10.0 with tiny alternation (so std > 0), one 100.0 spike
    val rows = (1 to 30).map { i =>
      val v = if (i == 25) 100.0 else if (i % 2 == 0) 10.1 else 9.9
      ("k", i.toLong, v)
    }
    val out = graft.ops.TimeSeries.rollingAnomalies(
        rows.toDF("k", "t", "v"), "k", "t", "v", window = 10, k = 3.0)
      .orderBy("t").collect()
    val flagged = out.filter(_.getBoolean(4)).map(_.getLong(1)).toSeq
    assert(flagged == Seq(25L), s"expected only the spike, got $flagged")
    // warm-up rows (fewer than 2 trailing obs) carry null z, not flags
    assert(out.head.isNullAt(3) && !out.head.getBoolean(4))
  }

  test("rollingAnomalies: exclusive window keeps the spike out of its own baseline") {
    // after the spike, values return to baseline: the spike sits IN the
    // trailing window of rows 26..35 and inflates std — those rows must
    // not flag, and by row 36 the window is clean again
    val rows = (1 to 40).map { i =>
      val v = if (i == 25) 100.0 else if (i % 2 == 0) 10.1 else 9.9
      ("k", i.toLong, v)
    }
    val out = graft.ops.TimeSeries.rollingAnomalies(
        rows.toDF("k", "t", "v"), "k", "t", "v", window = 10, k = 3.0)
      .orderBy("t").collect()
    assert(out.filter(_.getBoolean(4)).map(_.getLong(1)).toSeq == Seq(25L))
  }

  test("interpolation then forward-fill repairs trailing edge only") {
    val df = Seq(
      ("a", 0L, Some(2.0)), ("a", 10L, None), ("a", 20L, Some(4.0)), ("a", 30L, None)
    ).toDF("k", "t", "v")
    val interp = TimeSeries.interpolateLinear(df, "k", "t", "v")
    val out = TimeSeries.forwardFill(interp, "k", "t", Seq("v"))
      .orderBy("t").collect().map(_.getDouble(2)).toSeq
    assert(out == Seq(2.0, 3.0, 4.0, 4.0))
  }

  test("mannKendall: monotone series, sign symmetry, tie-degenerate z=0") {
    val up = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("t", "c")
    val r = TimeSeries.mannKendall(up, "t", "c").collect()(0)
    assert((r.getLong(0), r.getLong(1)) === (3L, 3L))
    assert(r.getDouble(2) === 66.0 / 18.0)
    assert(r.getDouble(3) === 2.0 / math.sqrt(66.0 / 18.0))
    val down = Seq((1L, 3L), (2L, 2L), (3L, 1L)).toDF("t", "c")
    val rd = TimeSeries.mannKendall(down, "t", "c").collect()(0)
    assert(rd.getLong(1) === -3L)
    assert(rd.getDouble(3) === -2.0 / math.sqrt(66.0 / 18.0))
    // all-tied series: variance fully tie-corrected away -> z = 0
    // (the "no trend" convention, matching the s = 0 branch)
    val flat = Seq((1L, 5L), (2L, 5L), (3L, 5L)).toDF("t", "c")
    val rf = TimeSeries.mannKendall(flat, "t", "c").collect()(0)
    assert(rf.getLong(1) === 0L && rf.getDouble(2) === 0.0 &&
      rf.getDouble(3) === 0.0)
  }

  test("acf: alternating series has hand-computed lag structure") {
    // counts 1,3,1,3: dev = 4x-8 = -4,4,-4,4; den = 64
    val df = Seq((1L, 1L), (2L, 3L), (3L, 1L), (4L, 3L)).toDF("t", "c")
    val out = TimeSeries.acf(df, "t", "c", maxLag = 3).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 3L), (2L, 2L), (3L, 1L)))
    assert(out.map(_.getDouble(2)).toSeq === Seq(-0.75, 0.5, -0.25))
  }

  test("theilSen: spike-robust median slope") {
    // counts 1,2,3,100: LSQ slope would chase the spike; pairwise
    // slopes sorted = [1, 1, 1, 33, 49, 97] -> median (1+33)/2 = 17
    val df = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 100L)).toDF("t", "c")
    val r = TimeSeries.theilSen(df, "t", "c").collect()(0)
    assert((r.getLong(0), r.getLong(1)) === (4L, 6L))
    assert(r.getDouble(2) === 17.0)
    // pure linear series recovers the exact slope
    val lin = Seq((1L, 10L), (2L, 13L), (3L, 16L)).toDF("t", "c")
    assert(TimeSeries.theilSen(lin, "t", "c").collect()(0).getDouble(2) === 3.0)
  }

  test("changePoint: level shift flagged at the true break, exact stats") {
    val df = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 20L), (5L, 20L),
      (6L, 20L)).toDF("t", "cnt")
    val out = TimeSeries.changePoint(df, "t", "cnt").collect()
    assert(out.length === 5) // t = n excluded
    // stat_3 = |6·30 − 3·90| / (6·√9) = 90/18 = 5.0 exactly
    assert(out(2).getDouble(3) === 5.0)
    assert(out.map(_.getBoolean(4)).toSeq ===
      Seq(false, false, true, false, false))
  }

  test("byKey variants equal the global op run on each key's own slice") {
    // three series with different shapes (alternating, trending with a
    // spike, level shift) plus a single-observation key — the byKey
    // forms must reproduce the global op per key, including the
    // degenerate answers
    val rows = Seq(
      ("alt", 1L, 1L), ("alt", 2L, 3L), ("alt", 3L, 1L), ("alt", 4L, 3L),
      ("trend", 1L, 1L), ("trend", 2L, 2L), ("trend", 3L, 3L), ("trend", 4L, 100L),
      ("shift", 1L, 10L), ("shift", 2L, 10L), ("shift", 3L, 10L),
      ("shift", 4L, 20L), ("shift", 5L, 20L), ("shift", 6L, 20L),
      ("lone", 1L, 7L))
    val df = rows.toDF("k", "t", "c")
    def slice(k: String) = df.filter(col("k") === k).select("t", "c")
    // acf
    val acfBy = TimeSeries.acfByKey(df, "k", "t", "c", maxLag = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3))).toSeq
    val acfGlobal = Seq("alt", "shift", "trend").flatMap(k =>
      TimeSeries.acf(slice(k), "t", "c", maxLag = 3).collect()
        .map(r => (k, r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) null else r.getDouble(2))))
    assert(acfBy === acfGlobal) // 'lone' has no lag pairs → no rows
    // theilSen (the single-observation key keeps a row: 0 pairs, null)
    val tsBy = TimeSeries.theilSenByKey(df, "k", "t", "c")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3))).toSeq
    val tsGlobal = Seq("alt", "lone", "shift", "trend").map { k =>
      val r = TimeSeries.theilSen(slice(k), "t", "c").collect()(0)
      (k, r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2))
    }
    assert(tsBy === tsGlobal)
    // changePoint
    val cpBy = TimeSeries.changePointByKey(df, "k", "t", "c")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(4),
        r.getBoolean(5))).toSeq
    val cpGlobal = Seq("alt", "shift", "trend").flatMap(k =>
      TimeSeries.changePoint(slice(k), "t", "c").collect()
        .map(r => (k, r.getLong(0), r.getDouble(3), r.getBoolean(4))))
    assert(cpBy === cpGlobal) // 'lone' has no t < n row → no rows
    // the plan partitions every window by the key — no global
    // single-partition window survives in any of the three byKey forms
    for (q <- Seq(TimeSeries.changePointByKey(df, "k", "t", "c"),
        TimeSeries.acfByKey(df, "k", "t", "c", maxLag = 3),
        TimeSeries.theilSenByKey(df, "k", "t", "c"))) {
      val windows = q.queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(windows.forall(_.partitionSpec.nonEmpty),
        s"global window in:\n${q.queryExecution.executedPlan}")
    }
  }

  test("rollingCorrCounts: perfect anti-correlation, degenerate null") {
    val df = Seq((1L, 1L, 6L), (2L, 2L, 4L), (3L, 3L, 2L)).toDF("t", "x", "y")
    val out = TimeSeries.rollingCorrCounts(df, "t", "x", "y", window = 7)
      .collect()
    assert(out(0).isNullAt(4), "single-row window is degenerate")
    assert(out(1).getDouble(4) === -1.0)
    assert(out(2).getDouble(4) === -1.0)
    // constant y: variance 0 -> null, never NaN
    val cst = Seq((1L, 1L, 5L), (2L, 2L, 5L)).toDF("t", "x", "y")
    val c2 = TimeSeries.rollingCorrCounts(cst, "t", "x", "y").collect()
    assert(c2.forall(_.isNullAt(4)))
  }

  test("seasonalDecomposeDaily: hand-computed trend/seasonal/residual") {
    // 9 consecutive days starting 2024-01-01 (a Monday), day i has i events
    val rows = (1 to 9).flatMap(i => Seq.fill(i)(f"2024-01-0$i 10:00:00"))
    val df = rows.toDF("s").select(col("s").cast("timestamp").as("ts"))
    val out = TimeSeries.seasonalDecomposeDaily(df, "ts")
      .select("cnt", "dow", "trend", "seasonal", "residual").collect()
    assert(out.map(_.getLong(0)).toSeq === (1L to 9L).toSeq)
    // Spark dayofweek: 1=Sun; Jan 1 2024 is Monday (2), wraps after Sunday
    assert(out.map(_.getInt(1)).toSeq === Seq(2, 3, 4, 5, 6, 7, 1, 2, 3))
    // centered 7-ROW frames truncate at the edges
    assert(out.map(_.getDouble(2)).toSeq ===
      Seq(2.5, 3.0, 3.5, 4.0, 5.0, 6.0, 6.5, 7.0, 7.5))
    // dow means: Mon (1+8)/2, Tue (2+9)/2, rest singletons; grand mean 5
    assert(out.map(_.getDouble(3)).toSeq ===
      Seq(-0.5, 0.5, -2.0, -1.0, 0.0, 1.0, 2.0, -0.5, 0.5))
    // residual = cnt - trend - seasonal
    assert(out.map(_.getDouble(4)).toSeq ===
      Seq(-1.0, -1.5, 1.5, 1.0, 0.0, -1.0, -1.5, 1.5, 1.0))
  }
  test("ohlc: open/close by (epoch, value) order, duplicate-epoch ties by value") {
    import spark.implicits._
    val df = Seq(
      ("A", 10L, 5.0), ("A", 20L, 9.0), ("A", 20L, 1.0), // bucket 0
      ("A", 3601L, 7.0),                                 // bucket 3600
      ("B", 5L, 2.0)
    ).toDF("k", "es", "v")
    val out = TimeSeries.ohlc(df, "k", "es", "v", bucketSize = 3600L)
      .collect()
    val rows = out.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    // bucket 0: open = es10 -> 5; close = max (es, v) = (20, 9) -> 9
    // (the (20, 1) duplicate-epoch reading loses the value tie-break)
    assert(rows.toSeq === Seq(
      ("A", 0L, 3L, 5.0, 9.0, 1.0, 9.0),
      ("A", 3600L, 1L, 7.0, 7.0, 7.0, 7.0),
      ("B", 0L, 1L, 2.0, 2.0, 2.0, 2.0)))
  }

  test("ohlc: single-reading bar has open = close = high = low") {
    import spark.implicits._
    val out = TimeSeries.ohlc(Seq(("x", 100L, 3.5)).toDF("k", "es", "v"),
      "k", "es", "v", bucketSize = 60L).collect()(0)
    assert(out.getLong(1) === 60L && out.getLong(2) === 1L)
    assert((3 to 6).forall(i => out.getDouble(i) === 3.5))
  }

}
