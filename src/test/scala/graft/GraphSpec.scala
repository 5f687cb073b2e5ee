package graft

import org.apache.spark.sql.functions._

import graft.ext.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("symmetric two-cycle stays uniform") {
    val e = Seq(("a", "b"), ("b", "a")).toDF("s", "t")
    val r = Graph.pagerank(e, "s", "t", iterations = 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(r("a") - 0.5) < 1e-9)
    assert(math.abs(r("b") - 0.5) < 1e-9)
  }

  test("dangling node redistributes its mass (hand-computed 3 steps)") {
    // A→B, B dangling. Exact per-step values computed by hand from the
    // update rule — pins both the formula and the dangling correction.
    val e = Seq(("A", "B")).toDF("s", "t")
    val r = Graph.pagerank(e, "s", "t", iterations = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(r("A") - 0.3394296875) < 1e-9, r.toString)
    assert(math.abs(r("B") - 0.6605703125) < 1e-9, r.toString)
  }

  test("rank mass is conserved: sum == 1") {
    val e = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "a"))
      .toDF("s", "t")
    val total = Graph.pagerank(e, "s", "t", iterations = 4)
      .agg(sum("rank")).head.getDouble(0)
    assert(math.abs(total - 1.0) < 1e-8, total.toString)
  }

  test("hub gets more rank than spokes") {
    // star: everyone links to h
    val e = Seq(("a", "h"), ("b", "h"), ("c", "h")).toDF("s", "t")
    val r = Graph.pagerank(e, "s", "t").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(r("h") > r("a") && r("a") == r("b") && r("b") == r("c"))
  }

  test("byte-identical under repartitioning") {
    val e = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "a"),
      ("d", "c"), ("c", "d")).toDF("s", "t")
    val r1 = Graph.pagerank(e, "s", "t").orderBy("node").collect().toSeq
    val r2 = Graph.pagerank(e.repartition(7), "s", "t")
      .orderBy("node").collect().toSeq
    assert(r1.map(_.toSeq) == r2.map(_.toSeq))
  }

  test("weighted: uniform weights reproduce the unweighted ranks exactly") {
    val e = Seq(("a", "b", 2.5), ("a", "c", 2.5), ("b", "c", 2.5), ("c", "a", 2.5))
      .toDF("s", "t", "w")
    val un = Graph.pagerank(e, "s", "t").orderBy("node").collect().toSeq
    val wt = Graph.pagerank(e, "s", "t", weightCol = Some("w"))
      .orderBy("node").collect().toSeq
    assert(un.map(_.toSeq) == wt.map(_.toSeq)) // equal weights cancel
  }

  test("weighted: rank flows proportionally to edge weight") {
    // a splits 3:1 between b and c
    val e = Seq(("a", "b", 3.0), ("a", "c", 1.0)).toDF("s", "t", "w")
    val r = Graph.pagerank(e, "s", "t", iterations = 1, weightCol = Some("w"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // contribs: b = r0*0.75, c = r0*0.25 → b-c gap = 0.85 * r0/2
    assert(math.abs((r("b") - r("c")) - 0.85 * (1.0 / 3) / 2) < 1e-9, r.toString)
  }

  test("hierarchyLevels: forest depths, cycles vanish, DAG takes min depth") {
    val forest = Seq(("b", "a"), ("c", "a"), ("d", "b"), ("e", "d")).toDF("c", "p")
    val lv = Graph.hierarchyLevels(forest, "c", "p")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(lv == Map("a" -> 0, "b" -> 1, "c" -> 1, "d" -> 2, "e" -> 3))
    // a 2-cycle has no root: neither node gets a level
    val cyc = Seq(("x", "y"), ("y", "x"), ("z", "x")).toDF("c", "p")
    val lc = Graph.hierarchyLevels(cyc, "c", "p").collect()
    assert(lc.isEmpty)
    // DAG: a node reachable at depths 1 and 2 reports the SHORTER
    val dag = Seq(("b", "a"), ("c", "a"), ("c", "b")).toDF("c", "p")
    val ld = Graph.hierarchyLevels(dag, "c", "p")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(ld == Map("a" -> 0, "b" -> 1, "c" -> 1))
  }

  test("multi-edges contribute multiply") {
    // a sends BOTH its half-shares to b when the a→b edge is doubled
    // vs a graph where a splits between b and c
    val doubled = Seq(("a", "b"), ("a", "b")).toDF("s", "t")
    val split = Seq(("a", "b"), ("a", "c")).toDF("s", "t")
    val rd = Graph.pagerank(doubled, "s", "t", iterations = 1).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val rs = Graph.pagerank(split, "s", "t", iterations = 1).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rd("b") > rs("b"))
  }
}
