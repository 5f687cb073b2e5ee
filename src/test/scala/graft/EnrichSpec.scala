package graft

import org.apache.spark.sql.functions._

import graft.ops.Enrich

class EnrichSpec extends SparkSpec {
  import spark.implicits._

  private def facts = Seq((1, 10, 5.0), (2, 20, 6.0), (3, 99, 7.0)).toDF("id", "dim_id", "v")
  private def dims = Seq((10, "A", true), (20, "B", false)).toDF("id", "name", "flag")

  test("dimJoin inner drops unmatched facts; left keeps them") {
    val inner = Enrich.dimJoin(facts, dims, "dim_id", "id",
      select = Seq("name" -> "dim_name"))
    assert(inner.count() === 2)
    assert(inner.columns.toSet === Set("id", "dim_id", "v", "dim_name"))
    val left = Enrich.dimJoin(facts, dims, "dim_id", "id", how = "left",
      select = Seq("name" -> "dim_name"))
    assert(left.count() === 3)
    assert(left.filter(col("id") === 3).collect()(0).getAs[String]("dim_name") === null)
  }

  test("semiGuard/antiGuard partition the fact set") {
    val semi = Enrich.semiGuard(facts, dims, "dim_id", "id")
    val anti = Enrich.antiGuard(facts, dims, "dim_id", "id")
    assert(semi.select("id").as[Int].collect().sorted === Array(1, 2))
    assert(anti.select("id").as[Int].collect() === Array(3))
    assert(semi.columns === facts.columns) // no dim columns leak
  }

  test("saltedJoin equals plain join for inner and left") {
    val left = (1 to 500).map(i => (i, if (i % 10 == 0) 1 else i % 7, i * 1.0))
      .toDF("id", "k", "v") // key 1 is hot
    val right = (0 to 6).map(i => (i, s"dim$i")).toDF("rk", "name")
    for (how <- Seq("inner", "left")) {
      val plain = left.join(right, left("k") === right("rk"), how)
        .select("id", "k", "v", "rk", "name").orderBy("id").collect()
      val salted = Enrich.saltedJoin(left, right, "k", "rk", saltBuckets = 8, how = how)
        .select("id", "k", "v", "rk", "name").orderBy("id").collect()
      assert(salted === plain, s"salted $how join diverged")
    }
  }
}
