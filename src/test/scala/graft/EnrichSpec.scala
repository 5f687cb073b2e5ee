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

  test("bloomPrune keeps every matching row and never changes join results") {
    val fact = (1 to 2000).map(i => (i, i % 500, i * 2.0)).toDF("fid", "fk", "fv")
    val dim = (0 until 50).map(i => (i * 3, s"d$i")).toDF("dk", "dname") // sparse keys
    val pruned = Enrich.bloomPrune(fact, dim, "fk", "dk", expectedItems = 1000)
    // no false negatives: pruned ⊇ the true semi-join
    val trueSemi = fact.join(dim, fact("fk") === dim("dk"), "left_semi")
    assert(pruned.join(dim, pruned("fk") === dim("dk"), "left_semi").count() ===
      trueSemi.count())
    // end-to-end: join after pruning == join without pruning
    val plain = fact.join(dim, fact("fk") === dim("dk"))
      .select("fid", "fk", "fv", "dk", "dname").orderBy("fid").collect()
    val viaBloom = pruned.join(dim, pruned("fk") === dim("dk"))
      .select("fid", "fk", "fv", "dk", "dname").orderBy("fid").collect()
    assert(viaBloom === plain)
    // and the filter actually prunes (166 of 500 fact keys can match;
    // fpp at this sizing keeps the pass-through well under the input)
    assert(pruned.count() < 2000, "bloom filter pruned nothing")
  }

  test("bloomPrune passes null keys through to the join (which drops them)") {
    val fact = Seq((1, Option(5)), (2, Option.empty[Int])).toDF("fid", "fk")
    val dim = Seq(Tuple1(5)).toDF("dk")
    val pruned = Enrich.bloomPrune(fact, dim, "fk", "dk", expectedItems = 10)
    // row 1 must survive; whether the null-key row survives pruning is
    // irrelevant to join semantics (it can never match) — assert the
    // end result only
    val joined = pruned.join(dim, pruned("fk") === dim("dk"))
      .select("fid").as[Int].collect()
    assert(joined === Array(1))
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

  test("skewJoin (hot-only salting) equals plain join, null keys survive left") {
    import spark.implicits._
    val left = (1 to 200).map(i =>
      (i.toLong, if (i <= 150) 0 else i % 7, s"v$i")).toDF("id", "k", "v")
      .unionByName(Seq((999L, -1, "nokey")).toDF("id", "k", "v"))
    val right = (0 to 6).map(i => (i, s"dim$i")).toDF("rk", "name")
    for (how <- Seq("inner", "left")) {
      val plain = left.join(right, left("k") === right("rk"), how)
        .select("id", "k", "v", "name").orderBy("id", "name").collect()
      val skew = Enrich.skewJoin(left, right, "k", "rk",
          hotKeys = Seq(0), saltBuckets = 8, how = how)
        .select("id", "k", "v", "name").orderBy("id", "name").collect()
      assert(skew === plain, s"skewJoin $how diverged")
    }
  }
}
