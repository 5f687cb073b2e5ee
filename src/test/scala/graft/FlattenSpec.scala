package graft

import org.apache.spark.sql.functions._

import graft.ops.Flatten

class FlattenSpec extends SparkSpec {
  import spark.implicits._

  private def nestedDf = {
    val parent = Seq((1, "p1"), (2, "p2"), (3, "p3")).toDF("id", "pname")
    val child = Seq((1, 10, "c10"), (1, 11, "c11"), (2, 12, "c12"))
      .toDF("pid", "cid", "cname")
    Flatten.nestChild(parent, child, "id", "pid", "kids")
  }

  test("explodeChild carries parent keys and renames") {
    val out = Flatten.explodeChild(nestedDf, "kids",
        parentKeys = Seq("id" -> "parent_id"),
        renames = Map("cid" -> "child_id"))
      .orderBy("parent_id", "child_id")
    assert(out.columns === Array("parent_id", "child_id", "cname"))
    assert(out.as[(Int, Int, String)].collect() ===
      Array((1, 10, "c10"), (1, 11, "c11"), (2, 12, "c12")))
  }

  test("explodeChild drops parents with empty/null child arrays") {
    val out = Flatten.explodeChild(nestedDf, "kids", Seq("id" -> "id"))
    assert(!out.select("id").as[Int].collect().contains(3))
  }

  test("nestChild maxChildren caps hot parents deterministically, flags the loss") {
    val parent = Seq((1, "hot"), (2, "cool"), (3, "lonely")).toDF("id", "pname")
    val child = Seq((1, 14, "c14"), (1, 12, "c12"), (1, 13, "c13"),
      (1, 11, "c11"), (2, 20, "c20")).toDF("pid", "cid", "cname")
    val out = Flatten.nestChild(parent, child, "id", "pid", "kids",
        maxChildren = Some(3))
      .orderBy("id").collect()
    // hot parent: the 3 SMALLEST structs by field order (cid leads), flagged
    val hotKids = out(0).getSeq[org.apache.spark.sql.Row](2).map(_.getInt(0))
    assert(hotKids === Seq(11, 12, 13))
    assert(out(0).getBoolean(3))
    // under-cap parent: all children, not flagged
    assert(out(1).getSeq[org.apache.spark.sql.Row](2).map(_.getInt(0)) === Seq(20))
    assert(!out(1).getBoolean(3))
    // childless parent: left join leaves null array + null flag
    assert(out(2).isNullAt(2) && out(2).isNullAt(3))
  }

  test("nestChild maxChildren handles map-typed (non-orderable) child fields") {
    // map columns are non-orderable: the rank key and the array sort
    // must exclude them instead of failing analysis
    val parent = Seq((1, "hot"), (2, "cool")).toDF("id", "pname")
    val child = Seq((1, 13, Map("a" -> 3)), (1, 11, Map("a" -> 1)),
      (1, 12, Map("a" -> 2)), (2, 20, Map("b" -> 9)))
      .toDF("pid", "cid", "attrs")
    val out = Flatten.nestChild(parent, child, "id", "pid", "kids",
        maxChildren = Some(2))
      .orderBy("id").collect()
    val hotKids = out(0).getSeq[org.apache.spark.sql.Row](2).map(_.getInt(0))
    assert(hotKids === Seq(11, 12)) // ranked by the orderable cid field
    assert(out(0).getBoolean(3))
    assert(out(1).getSeq[org.apache.spark.sql.Row](2).map(_.getInt(0)) === Seq(20))
    assert(!out(1).getBoolean(3))
    // the map payload survives the trip
    assert(out(0).getSeq[org.apache.spark.sql.Row](2).head.getMap[String, Int](1)
      === Map("a" -> 1))
  }

  test("nestChild maxChildren works when EVERY non-key child field is non-orderable") {
    // no orderable rank prefix exists: the cap still applies, the call
    // must not fail analysis, and WHICH rows survive is the content-
    // hash order — reproducible across partitioning, never
    // partition-arrival order
    val parent = Seq((1, "hot"), (2, "cool")).toDF("id", "pname")
    val child = Seq((1, Map("a" -> 1)), (1, Map("a" -> 2)), (1, Map("a" -> 3)),
      (2, Map("b" -> 9))).toDF("pid", "attrs")
    val out = Flatten.nestChild(parent, child, "id", "pid", "kids",
        maxChildren = Some(2))
      .orderBy("id").collect()
    assert(out(0).getSeq[org.apache.spark.sql.Row](2).size === 2)
    assert(out(0).getBoolean(3))
    assert(out(1).getSeq[org.apache.spark.sql.Row](2).size === 1)
    assert(!out(1).getBoolean(3))
    // the surviving subset is CONTENT-deterministic: any repartitioning
    // must keep exactly the same capped rows in the same order
    val kept = out(0).getSeq[org.apache.spark.sql.Row](2)
      .map(_.getMap[String, Int](0).toMap)
    val again = Flatten.nestChild(parent, child.repartition(7), "id", "pid",
        "kids", maxChildren = Some(2))
      .orderBy("id").collect()(0).getSeq[org.apache.spark.sql.Row](2)
      .map(_.getMap[String, Int](0).toMap)
    assert(again === kept, "capped subset must not depend on partitioning")
  }

  test("nestChild maxChildren: orderable-field TIES break by content hash, not arrival") {
    // two children tied on the only orderable field (score) but with
    // different map payloads: the survivor must be the same at any
    // partitioning (the content-hash tiebreaker), not whichever row a
    // partition happened to deliver first
    val parent = Seq((1, "p")).toDF("id", "pname")
    val child = Seq((1, 5, Map("k" -> 1)), (1, 5, Map("k" -> 2)),
      (1, 5, Map("k" -> 3))).toDF("pid", "score", "attrs")
    def run(c: org.apache.spark.sql.DataFrame) =
      Flatten.nestChild(parent, c, "id", "pid", "kids", maxChildren = Some(2))
        .collect()(0).getSeq[org.apache.spark.sql.Row](2)
        .map(_.getMap[String, Int](1).toMap)
    assert(run(child.repartition(5)) === run(child.repartition(1)))
  }

  test("explodeChild applies childPrefix like json_normalize meta_prefix") {
    val out = Flatten.explodeChild(nestedDf, "kids", Seq("id" -> "id"), childPrefix = "k_")
    assert(out.columns === Array("id", "k_cid", "k_cname"))
  }

  test("explodeChild rejects non array-of-struct child") {
    val df = Seq((1, Seq(1, 2))).toDF("id", "nums")
    intercept[IllegalArgumentException](Flatten.explodeChild(df, "nums", Seq("id" -> "id")))
  }

  test("explodeChild2 flattens two levels carrying keys through both") {
    val gc = Seq((1, 10, Seq((100, "x"), (101, "y"))), (1, 11, Seq((102, "z"))))
      .toDF("pid", "cid", "pts")
      .select(col("pid"), col("cid"),
        col("pts").cast("array<struct<ptid:int,v:string>>").as("pts"))
    val parent = Seq((1, "p")).toDF("id", "pname")
    val nested = Flatten.nestChild(parent, gc, "id", "pid", "mids")
    val out = Flatten.explodeChild2(nested, "mids", "pts",
        parentKeys = Seq("id" -> "root_id"),
        childCarry = Seq("cid" -> "mid_id"))
      .orderBy("root_id", "mid_id", "ptid")
    assert(out.columns === Array("root_id", "mid_id", "ptid", "v"))
    assert(out.as[(Int, Int, Int, String)].collect() ===
      Array((1, 10, 100, "x"), (1, 10, 101, "y"), (1, 11, 102, "z")))
  }

  test("nestChild then explodeChild is identity on child rows") {
    val parent = Seq((1, "p1"), (2, "p2")).toDF("id", "pname")
    val child = (1 to 20).map(i => (i % 2 + 1, i, s"c$i")).toDF("pid", "cid", "cname")
    val nested = Flatten.nestChild(parent, child, "id", "pid", "kids")
    val roundtrip = Flatten.explodeChild(nested, "kids", Seq("id" -> "pid"))
      .select("pid", "cid", "cname").orderBy("cid")
    assert(roundtrip.collect() === child.orderBy("cid").collect())
  }
}
