package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits: known Morton codes") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 3L), (7L, 0L),
      ((1L << 30), (1L << 30))).toDF("x", "y")
    val out = df.select(Layout.zValue(col("x"), col("y")).as("z"))
      .as[Long].collect()
    // z(2,3): x=10b → bit at pos 2; y=11b → bits at pos 1,3 → 4+2+8 = 14
    assert(out === Array(0L, 1L, 2L, 3L, 14L, 21L,
      (1L << 60) | (1L << 61)))
  }

  test("zValue masks to the requested bit width and stays positive") {
    val df = Seq(((1L << 40) | 5L, 3L)).toDF("x", "y")
    // bits=31: the x bit at position 40 is ignored, low bits survive:
    // x=101b → pos 0,4; y=11b → pos 1,3 → 1+2+8+16 = 27
    val z = df.select(Layout.zValue(col("x"), col("y"), bits = 31).as("z"))
      .as[Long].collect()(0)
    assert(z === 27L)
    assert(z >= 0L)
  }

  test("driver-side zOf matches the column-side zValue (200 random points)") {
    val rnd = new scala.util.Random(11)
    val pts = Seq.fill(200)((rnd.nextLong(1L << 31), rnd.nextLong(1L << 31)))
    val fromCol = pts.toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y")).as("z")).as[Long].collect()
    val fromDriver = pts.map { case (x, y) => Layout.zOf(x, y) }
    assert(fromCol.toSeq === fromDriver)
  }

  test("zValueN: 3-way interleave known answers and driver parity") {
    // x=1 → pos 0; y=1 → pos 1; w=1 → pos 2  ⇒ z(1,1,1) = 7
    // z(2,0,1): x bit1 → pos 3; w bit0 → pos 2 ⇒ 12
    val df = Seq((1L, 1L, 1L), (2L, 0L, 1L), (5L, 3L, 0L)).toDF("x", "y", "w")
    val out = df.select(
      Layout.zValueN(Seq(col("x"), col("y"), col("w")), bits = 16).as("z"))
      .as[Long].collect()
    val expected = Seq(Seq(1L, 1L, 1L), Seq(2L, 0L, 1L), Seq(5L, 3L, 0L))
      .map(Layout.zOfN(_, 16))
    assert(out.toSeq === expected)
    assert(expected.take(2) === Seq(7L, 12L))
    // the 2-D forms are the n=2 special case
    assert(Layout.zOf(5L, 3L) === Layout.zOfN(Seq(5L, 3L), 31))
  }

  test("zRangesForBox: exact, sorted, disjoint cover (50 random boxes, 16×16)") {
    val bits = 4
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 50) {
      val x1 = rnd.nextInt(16); val x2 = x1 + rnd.nextInt(16 - x1)
      val y1 = rnd.nextInt(16); val y2 = y1 + rnd.nextInt(16 - y1)
      val ranges = Layout.zRangesForBox(x1, x2, y1, y2, bits, maxRanges = Int.MaxValue)
      ranges.sliding(2).foreach {
        case Seq((_, h), (l2, _)) => assert(l2 > h + 1, "ranges must be disjoint, non-adjacent")
        case _ =>
      }
      val covered = ranges.flatMap { case (lo, hi) => lo to hi }.toSet
      val exact = (for { x <- x1 to x2; y <- y1 to y2 }
        yield Layout.zOf(x, y, bits)).toSet
      assert(covered === exact, s"box [$x1,$x2]×[$y1,$y2]")
    }
  }

  test("zRangesForBox coalescing respects maxRanges and only over-covers") {
    val r = Layout.zRangesForBox(1, 14, 1, 14, bits = 4, maxRanges = 3)
    assert(r.size <= 3)
    val covered = r.flatMap { case (lo, hi) => lo to hi }.toSet
    val exact = (for { x <- 1 to 14; y <- 1 to 14 } yield Layout.zOf(x, y, 4)).toSet
    assert(exact.subsetOf(covered))
  }

  test("scanZBox returns exactly the direct box-filter rows") {
    val grid = (for { x <- 0 until 32; y <- 0 until 32 } yield (x.toLong, y.toLong))
      .toDF("x", "y")
      .withColumn("z", Layout.zValue(col("x"), col("y"), bits = 5))
    val viaZ = Layout.scanZBox(grid, col("x"), col("y"), col("z"),
        3, 17, 5, 29, bits = 5, maxRanges = 8)
      .select("x", "y").as[(Long, Long)].collect().toSet
    val direct = grid.filter(col("x").between(3, 17) && col("y").between(5, 29))
      .select("x", "y").as[(Long, Long)].collect().toSet
    assert(viaZ === direct && viaZ.nonEmpty)
  }

  private def touched(layout: DataFrame, pred: Column): Long = layout
    .select(col("x"), col("y"), spark_partition_id().as("p"))
    .filter(pred).select("p").distinct().count()

  test("zorderBy prunes on BOTH dimensions; a single-dim sort only on its own") {
    // 64×64 grid → 4096 cells into 16 range partitions. The point of the
    // z-layout: ONE layout that lets min/max pruning work for filters on
    // either column. A single-dimension sort prunes its own column and
    // nothing else.
    val grid = (for { x <- 0 until 64; y <- 0 until 64 } yield (x, y))
      .toDF("x", "y")
    val zed = Layout.zorderBy(grid, col("x"), col("y"), numPartitions = 16)

    // an aligned 8×8 box is a contiguous run of 64 z-values — it can
    // only straddle a couple of range boundaries
    val boxZ = touched(zed, col("x").between(8, 15) && col("y").between(8, 15))
    assert(boxZ <= 4, s"z-ordered aligned box touched $boxZ of 16 partitions")

    // one-dimensional stripes: each constrains half the interleaved
    // bits → a bounded subset of partitions, for EITHER dimension
    val xStripeZ = touched(zed, col("x").between(8, 15))
    val yStripeZ = touched(zed, col("y").between(8, 15))
    assert(xStripeZ <= 10, s"x-stripe touched $xStripeZ of 16")
    assert(yStripeZ <= 10, s"y-stripe touched $yStripeZ of 16")

    // contrast: x-sorted layout — an x-stripe prunes perfectly, but a
    // y-stripe reads (nearly) every partition
    val xSorted = grid.repartitionByRange(16, col("x"), col("y"))
    val yStripeSorted = touched(xSorted, col("y").between(8, 15))
    assert(yStripeSorted >= 14, s"x-sorted y-stripe touched $yStripeSorted — expected ~all")
    assert(math.max(xStripeZ, yStripeZ) < yStripeSorted,
      "z-order worst-dimension pruning must beat the single-sort blind dimension")
  }

  test("compact bin-packs small files and preserves content exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_spec")
      .resolve("tbl").toString
    val df = (1 to 500).map(i => (i.toLong, s"row_$i", i * 1.5)).toDF("id", "s", "v")
    df.repartition(40).write.mode("overwrite").parquet(dir)
    val rep = Layout.compact(spark, dir, targetBytes = 1L << 30)
    assert(rep.filesBefore === 40)
    assert(rep.filesAfter === 1, s"expected 1 packed file, got ${rep.filesAfter}")
    val back = spark.read.parquet(dir)
    assert(back.count() === 500)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
    // no work dirs left behind
    val parent = new java.io.File(dir).getParentFile.listFiles().map(_.getName)
    assert(parent === Array("tbl"))
    // idempotent: compacting a compacted table is a no-op-shaped rewrite
    val rep2 = Layout.compact(spark, dir, targetBytes = 1L << 30)
    assert(rep2.filesBefore === 1 && rep2.filesAfter === 1)
  }

  test("compactPartitions packs each leaf independently; partition column survives") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_part")
      .resolve("fact").toString
    val df = (1 to 300).map(i => (i.toLong, s"d${i % 3}", i.toDouble)).toDF("id", "day", "v")
    df.repartition(10).write.mode("overwrite").partitionBy("day").parquet(dir)
    val reps = Layout.compactPartitions(spark, dir, targetBytes = 1L << 30)
    assert(reps.keySet === Set("day=d0", "day=d1", "day=d2"))
    reps.values.foreach(r => assert(r.filesAfter === 1 && r.filesBefore > 1))
    val back = spark.read.parquet(dir)
    assert(back.count() === 300)
    // partition column readable and content unchanged (modulo column order)
    assert(back.select("id", "day", "v").exceptAll(df).isEmpty)
  }
}
