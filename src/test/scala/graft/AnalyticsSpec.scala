package graft

import org.apache.spark.sql.functions._
import graft.ops.Validate
import graft.ext.Corpus

/** Round-5 analytics additions: histogram bucketing, z-score outlier
  * screen, weighted priority sampling, approximate quantiles.
  */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("hand-rolled histogram bucket matches Spark's width_bucket builtin") {
    // the registered q_histogram hand-rolls the bucket expression so the
    // DuckDB oracle can replay it bit-for-bit; this guards that the
    // hand-rolled semantics ARE width_bucket's (incl. under-/overflow)
    val lo = 900.0; val hi = 105000.0; val nb = 20
    val vals = Seq(-5.0, 0.0, 899.99, 900.0, 901.5, 52000.0, 104999.99,
      105000.0, 200000.0) ++ (0 until 500).map(i => 900.0 + i * 207.9)
    val df = vals.toDF("v")
    val hand = when(col("v") < lo, lit(0L))
      .when(col("v") >= hi, lit(nb.toLong + 1))
      .otherwise(floor(lit(nb.toDouble) * (col("v") - lo) / (hi - lo)).cast("long") + lit(1L))
    val diff = df.select(hand.as("h"), width_bucket(col("v"), lit(lo), lit(hi), lit(nb)).as("b"))
      .filter(col("h") =!= col("b"))
    assert(diff.isEmpty)
  }

  test("zScoreOutliers flags extreme values, skips constant and singleton groups") {
    val rows = (1 to 9).map(i => (i.toLong, "a", 10.0)) ++ Seq((10L, "a", 100.0)) ++
      (11 to 14).map(i => (i.toLong, "b", 7.0)) ++ // constant: variance 0
      Seq((15L, "c", 999.0)) // singleton: n = 1
    val df = rows.toDF("id", "grp", "v")
    val out = Validate.zScoreOutliers(df, "grp", "v", threshold = 2.0)
    assert(out.select("id").as[Long].collect().toSeq === Seq(10L))
    // for group a: mean 19, sample sd sqrt(810) => z(100) ≈ 2.84
  }

  test("prioritySample: deterministic across partitioning, matches direct replay, weight-dominant row kept") {
    val docs = (1 to 200).map(i => (i.toLong, if (i == 42) 1000000L else (i % 17 + 1).toLong))
      .toDF("doc_id", "w")
    val k = 20
    val got = Corpus.prioritySample(docs, "doc_id", col("w"), k, seed = 3L)
      .select("doc_id").as[Long].collect().toSet
    assert(got.size === k)
    // partitioning invariance (TakeOrdered must not depend on layout)
    val got7 = Corpus.prioritySample(docs.repartition(7), "doc_id", col("w"), k, seed = 3L)
      .select("doc_id").as[Long].collect().toSet
    assert(got7 === got)
    // direct replay of the priority definition, top-k computed driver-side
    val pri = Corpus.prioritySample(docs, "doc_id", col("w"), docs.count().toInt, seed = 3L)
    val all = docs.withColumn("u",
        (pmod(graft.functions.VectorExpressions.fnv1a64(
          concat(col("doc_id").cast("string"), lit(":3"))), lit(1000000L)) + 1L)
          .cast("double") / lit(1000000.0))
      .withColumn("pri", col("w").cast("double") / col("u"))
      .select("doc_id", "pri").as[(Long, Double)].collect()
    val expect = all.sortBy { case (id, p) => (-p, id) }.take(k).map(_._1).toSet
    assert(got === expect)
    // a weight 5 orders of magnitude above the rest always survives
    assert(got.contains(42L))
    assert(pri.count() === docs.count()) // k >= n degrades to identity membership
  }

  test("approx quantiles stay within 1% relative error of exact percentiles") {
    val df = spark.range(1, 20001).select((col("id") % 9973).cast("double").as("v"))
    val ps = Seq(0.25, 0.5, 0.75, 0.95)
    val approx = df.agg(percentile_approx(col("v"),
      array(ps.map(lit): _*), lit(10000)).as("qs"))
      .select(explode(col("qs"))).as[Double].collect()
    val exact = df.agg(percentile(col("v"), array(ps.map(lit): _*)).as("qs"))
      .select(explode(col("qs"))).as[Double].collect()
    approx.zip(exact).foreach { case (a, e) =>
      assert(math.abs(a - e) <= 0.01 * math.max(1.0, math.abs(e)),
        s"approx $a vs exact $e")
    }
  }
}
