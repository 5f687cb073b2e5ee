package graft

import org.apache.spark.sql.functions.{col, when}

import graft.ops.Snapshot

class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  test("diff classifies inserts, deletes, updates with changed-column lists") {
    val old = Seq(
      (1L, "a", 10.0), // unchanged
      (2L, "b", 20.0), // value changes
      (3L, "c", 30.0), // deleted
      (4L, "d", 40.0)  // both columns change
    ).toDF("k", "s", "v")
    val nw = Seq(
      (1L, "a", 10.0),
      (2L, "b", 21.0),
      (4L, "e", 41.0),
      (5L, "f", 50.0)  // inserted
    ).toDF("k", "s", "v")
    val got = Snapshot.diff(old, nw, Seq("k"))
      .orderBy("k").as[(Long, String, String)].collect().toSeq
    assert(got === Seq(
      (2L, "U", "v"),
      (3L, "D", ""),
      (4L, "U", "s,v"),
      (5L, "I", "")))
  }

  test("diff is null-safe: null == null is unchanged, null vs value is a change") {
    val old = Seq((1L, Option.empty[String]), (2L, Option("x")), (3L, Option.empty[String]))
      .toDF("k", "s")
    val nw = Seq((1L, Option.empty[String]), (2L, Option.empty[String]), (3L, Option("y")))
      .toDF("k", "s")
    val got = Snapshot.diff(old, nw, Seq("k"))
      .orderBy("k").as[(Long, String, String)].collect().toSeq
    assert(got === Seq((2L, "U", "s"), (3L, "U", "s")))
  }

  test("diff with composite keys and key-only schema") {
    val old = Seq((1L, 10L), (1L, 11L)).toDF("a", "b")
    val nw = Seq((1L, 11L), (2L, 12L)).toDF("a", "b")
    val got = Snapshot.diff(old, nw, Seq("a", "b"))
      .orderBy("a", "b").as[(Long, Long, String, String)].collect().toSeq
    assert(got === Seq((1L, 10L, "D", ""), (2L, 12L, "I", "")))
  }

  test("diffSummary counts ops") {
    val old = Seq((1L, "x"), (2L, "y")).toDF("k", "s")
    val nw = Seq((2L, "z"), (3L, "w")).toDF("k", "s")
    val got = Snapshot.diffSummary(old, nw, Seq("k"))
      .as[(String, Long)].collect().toSeq
    assert(got === Seq(("D", 1L), ("I", 1L), ("U", 1L)))
  }

  test("diffFull carries replay payload: new side for I/U, old for D") {
    val old = Seq((1L, "x"), (2L, "y")).toDF("k", "s")
    val nw = Seq((2L, "z"), (3L, "w")).toDF("k", "s")
    val got = Snapshot.diffFull(old, nw, Seq("k"))
      .orderBy("k").as[(Long, String, String)].collect().toSeq
    assert(got === Seq((1L, "x", "D"), (2L, "z", "U"), (3L, "w", "I")))
  }

  test("round-trip law: applyChanges(old, diffFull(old, new)) == new") {
    val rnd = new scala.util.Random(19)
    val old = (1 to 500).map(i => (i.toLong, rnd.nextInt(100), rnd.nextBoolean()))
      .toDF("k", "v", "f")
    // mutate: delete ~10%, update ~20%, insert 50 fresh
    val nw = old.filter(col("k") % 10 =!= 0)
      .withColumn("v", when(col("k") % 5 === 0, col("v") + 1000).otherwise(col("v")))
      .unionByName((1001 to 1050).map(i => (i.toLong, i, false)).toDF("k", "v", "f"))
    val feed = Snapshot.diffFull(old, nw, Seq("k"))
    val replayed = Snapshot.applyChanges(old, feed, Seq("k"))
    assert(replayed.orderBy("k").collect().map(_.toSeq).toSeq ==
      nw.orderBy("k").collect().map(_.toSeq).toSeq)
    // and an empty feed is the identity
    val idFeed = Snapshot.diffFull(old, old, Seq("k"))
    assert(idFeed.count() == 0)
    assert(Snapshot.applyChanges(old, idFeed, Seq("k")).count() == old.count())
  }
}
