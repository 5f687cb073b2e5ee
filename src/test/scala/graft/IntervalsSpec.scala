package graft

import org.apache.spark.sql.functions.col

import graft.ops.Intervals

class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  test("mergeOverlapping stitches overlapping and touching spans, splits on gaps") {
    val spans = Seq(
      (1L, 0L, 10L),   // island A
      (1L, 5L, 12L),   // overlaps -> A
      (1L, 12L, 20L),  // touches end exactly (start == prev max) -> A
      (1L, 25L, 30L),  // gap of 5 -> island B
      (2L, 0L, 1L)     // other key
    ).toDF("k", "s", "e")
    val got = Intervals.mergeOverlapping(spans, "k", "s", "e")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 0L, 20L, 3L, 20L),
      (1L, 25L, 30L, 1L, 5L),
      (2L, 0L, 1L, 1L, 1L)))
  }

  test("maxGap bridges near-adjacent spans") {
    val spans = Seq((1L, 0L, 10L), (1L, 14L, 20L)).toDF("k", "s", "e")
    val strict = Intervals.mergeOverlapping(spans, "k", "s", "e").count()
    val bridged = Intervals.mergeOverlapping(spans, "k", "s", "e", maxGap = 5L)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(strict === 2)
    assert(bridged === Seq((1L, 0L, 20L, 2L, 20L)))
  }

  test("null start drops, null end becomes a point, inverted spans clamp") {
    val spans = Seq(
      (1L, Option(5L), Option.empty[Long]),  // point at 5
      (1L, Option.empty[Long], Option(99L)), // unanchored: dropped
      (1L, Option(7L), Option(3L))           // inverted: clamps to point at 7
    ).toDF("k", "s", "e")
    val got = Intervals.mergeOverlapping(spans, "k", "s", "e")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 5L, 5L, 1L, 0L), (1L, 7L, 7L, 1L, 0L)))
  }

  test("coverage rolls islands up per key") {
    val spans = Seq(
      (1L, 0L, 10L), (1L, 5L, 15L), (1L, 100L, 110L),
      (2L, 0L, 50L)
    ).toDF("k", "s", "e")
    val got = Intervals.coverage(spans, "k", "s", "e")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 25L, 2L, 2L), (2L, 50L, 1L, 1L)))
  }

  test("island ids are contiguous per key under multi-partition shuffle") {
    val rnd = new scala.util.Random(11)
    val spans = Seq.tabulate(500) { i =>
      (i % 7L, rnd.nextInt(1000).toLong, 0L)
    }.map { case (k, s, _) => (k, s, s + 1 + rnd.nextInt(50)) }
    val df = spans.toDF("k", "s", "e").repartition(8)
    val islands = Intervals.mergeOverlapping(df, "k", "s", "e")
      .as[(Long, Long, Long, Long, Long)].collect()
    // islands per key are sorted, non-overlapping, and separated by
    // a strictly positive gap
    islands.groupBy(_._1).foreach { case (_, is) =>
      is.sliding(2).foreach {
        case Array((_, _, e1, _, _), (_, s2, _, _, _)) => assert(s2 > e1)
        case _ =>
      }
    }
    // and the union length equals a driver-side replay
    val byKey = spans.groupBy(_._1)
    for ((k, ss) <- byKey) {
      val merged = ss.sortBy(x => (x._2, x._3)).foldLeft(List.empty[(Long, Long)]) {
        case (acc @ ((as, ae) :: rest), (_, s, e)) =>
          if (s <= ae) (as, math.max(ae, e)) :: rest else (s, e) :: acc
        case (Nil, (_, s, e)) => List((s, e))
      }
      val want = merged.map { case (s, e) => e - s }.sum
      val got = islands.filter(_._1 == k).map(_._5).sum
      assert(got === want, s"key $k union length")
    }
  }

  test("binnedPointJoin == plain theta join, each pair exactly once") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val points = (1 to 300).map(i => (i.toLong, rnd.nextDouble() * 200 - 100))
      .toDF("pid", "p")
    val ivs = (1 to 40).map { i =>
      val lo = rnd.nextDouble() * 180 - 100
      (i.toLong, lo, lo + rnd.nextDouble() * 60) // widths 0..60, many bins at w=7
    }.toDF("iid", "lo", "hi")
    val viaBins = graft.ops.Intervals
      .binnedPointJoin(points, "p", ivs, "lo", "hi", binSize = 7.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val plain = points.join(ivs, col("p") >= col("lo") && col("p") < col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaBins.sorted == plain.sorted)
    assert(viaBins.distinct.size == viaBins.size, "pair emitted more than once")
  }

  test("binnedPointJoin edges: lo inclusive, hi exclusive, negatives") {
    import spark.implicits._
    val points = Seq((1L, -10.0), (2L, 0.0), (3L, 9.999), (4L, 10.0)).toDF("pid", "p")
    val ivs = Seq((1L, -10.0, 10.0)).toDF("iid", "lo", "hi")
    val got = graft.ops.Intervals
      .binnedPointJoin(points, "p", ivs, "lo", "hi", binSize = 3.0)
      .select("pid").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 2L, 3L)) // 10.0 == hi excluded
  }

  test("binnedPointJoin honors extraKeys") {
    import spark.implicits._
    val points = Seq(("a", 5.0, 1L), ("b", 5.0, 2L)).toDF("tenant", "p", "pid")
    val ivs = Seq(("a", 0.0, 10.0, 10L)).toDF("tenant", "lo", "hi", "iid")
    val got = graft.ops.Intervals
      .binnedPointJoin(points, "p", ivs, "lo", "hi", 5.0, extraKeys = Seq("tenant"))
      .select("pid").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L)) // tenant b must not match tenant a's interval
  }

  test("binnedIntervalJoin == plain overlap theta join, each pair once") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val a = (1 to 120).map { i =>
      val lo = rnd.nextDouble() * 150 - 70
      (i.toLong, lo, lo + rnd.nextDouble() * 40)
    }.toDF("aid", "alo", "ahi")
    val b = (1 to 90).map { i =>
      val lo = rnd.nextDouble() * 150 - 70
      (i.toLong, lo, lo + rnd.nextDouble() * 25)
    }.toDF("bid", "blo", "bhi")
    val viaBins = graft.ops.Intervals
      .binnedIntervalJoin(a, "alo", "ahi", b, "blo", "bhi", binSize = 9.0)
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val plain = a.join(b, col("alo") < col("bhi") && col("blo") < col("ahi"))
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaBins.sorted == plain.sorted)
    assert(viaBins.distinct.size == viaBins.size,
      "canonical-bin dedup must emit each overlapping pair exactly once")
  }

  test("binnedIntervalJoin: touching half-open spans do not overlap") {
    import spark.implicits._
    val a = Seq((1L, 0.0, 10.0)).toDF("aid", "alo", "ahi")
    val b = Seq((1L, 10.0, 20.0), (2L, 9.999, 12.0)).toDF("bid", "blo", "bhi")
    val got = graft.ops.Intervals
      .binnedIntervalJoin(a, "alo", "ahi", b, "blo", "bhi", 4.0)
      .select("bid").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(2L)) // [0,10) meets [10,20) only at the open edge
  }

  test("binnedPointJoin guards runaway interval width") {
    import spark.implicits._
    val points = Seq((1L, 5.0)).toDF("pid", "p")
    val ivs = Seq((1L, 0.0, 1e9)).toDF("iid", "lo", "hi")
    intercept[Exception] {
      graft.ops.Intervals.binnedPointJoin(points, "p", ivs, "lo", "hi", 1.0,
        maxBinsPerInterval = 100L).count()
    }
  }
}
