package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge lists. [[Dedup.connectedComponents]]
  * covers the equivalence-closure shape (dedup clusters); this adds the
  * influence-propagation shape — PageRank — for entity-importance
  * scoring over FK graphs, citation/link graphs, and user-interaction
  * graphs.
  *
  * Scale shape: each iteration is one join of the rank frame with the
  * edge list (shuffle keyed by src) and one aggregate keyed by dst —
  * the textbook distributed PageRank profile. Node count and dangling
  * mass ride as broadcast 1-row frames (no driver round-trip, the plan
  * stays lazy). Iterations chain the plan; pass `checkpointDir` (or
  * rely on local pinning) when deep chains need cutting on a real
  * cluster, same contract as connectedComponents.
  *
  * Determinism: per-edge contributions are rounded and accumulated in
  * DECIMAL (order-independent under any partial-agg schedule); the
  * per-node update is then a fixed sequence of scalar IEEE ops on those
  * exact sums, and ranks re-round to 12 decimals each iteration — so a
  * DuckDB oracle replaying the same expressions matches byte-for-byte
  * at any parallelism.
  */
object Graph {

  /** PageRank with `iterations` fixed synchronous steps, damping `d`:
    * `r'(v) = (1-d)/N + d * (Σ_{u→v} r(u)/outdeg(u) + danglingMass/N)`
    * — dangling nodes (no out-edges) spread their rank uniformly, the
    * standard correction that keeps Σr = 1. Multi-edges contribute
    * multiply (pre-`distinct` the edge frame if unwanted).
    *
    * Returns (node, rank) over all nodes appearing as src or dst.
    */
  def pagerank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int = 3, damping: Double = 0.85,
               checkpointEach: Boolean = false,
               checkpointDir: Option[String] = None,
               weightCol: Option[String] = None): DataFrame = {
    require(iterations >= 1, "pagerank: need at least one iteration")
    checkpointDir.foreach(edges.sparkSession.sparkContext.setCheckpointDir)
    // Lazy by default ON PURPOSE: although ranks_i is referenced 3× by
    // iteration i+1, the repeated subplans are identical, so Catalyst
    // collapses them to ReusedExchange within the one action — measured
    // ~2× FASTER at bench scale than eager localCheckpoints (which pay
    // a job + materialization each). Enable checkpointEach for DEEP
    // iteration counts (plan size grows linearly and analysis time
    // eventually dominates) or checkpointDir on a real cluster where
    // executor loss must not invalidate the lineage.
    val pin: DataFrame => DataFrame =
      if (!checkpointEach) identity
      else if (checkpointDir.isDefined) _.checkpoint(true)
      else _.localCheckpoint(true)
    // weighted form: rank flows proportionally to edge weight instead
    // of uniformly — weights round to 6dp decimals so the per-src
    // totals are exact, and each contribution stays one multiply + one
    // divide on deterministic inputs
    val w = weightCol.map(c => col(c).cast("decimal(18,6)"))
      .getOrElse(lit(1).cast("decimal(18,6)"))
    val e = pin(edges.select(col(srcCol).cast("string").as("src"),
      col(dstCol).cast("string").as("dst"), w.as("w")))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val outdeg = e.groupBy(col("src"))
      .agg(sum(col("w")).cast("double").as("od"))
      .where(col("od") > 0)
    val nn = nodes.agg(count(lit(1)).as("n"))
    // IEEE 1-d, not a pre-simplified constant: the oracle writes the
    // same subtraction, so both sides hold the identical double
    val teleport = lit(1.0) - lit(damping)
    val outdegPinned = pin(outdeg)

    // r0 = 1/N per node; n rides along so iterations don't re-join it
    var ranks = nodes.crossJoin(broadcast(nn))
      .select(col("node"), (lit(1.0) / col("n")).as("rank"), col("n"))
    for (_ <- 1 to iterations) {
      val contribs = e.join(ranks.select(col("node").as("src"), col("rank")), "src")
        .join(outdegPinned, "src")
        .select(col("dst").as("node"),
          round(col("rank") * col("w").cast("double") / col("od"), 12)
            .cast("decimal(24,12)").as("cd"))
        .groupBy(col("node")).agg(sum(col("cd")).as("csum"))
      val dangling = ranks
        .join(outdegPinned, ranks("node") === outdegPinned("src"), "left_anti")
        .agg(coalesce(sum(round(col("rank"), 12).cast("decimal(24,12)")),
          lit(0).cast("decimal(34,12)")).as("dsum"))
      ranks = pin(ranks
        .join(contribs, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"),
          round(teleport / col("n") + lit(damping) *
            (coalesce(col("csum").cast("double"), lit(0.0)) +
              col("dsum").cast("double") / col("n")), 12).as("rank"),
          col("n")))
    }
    ranks.select(col("node"), col("rank"))
  }

  /** Hierarchy levels over a parent-child forest (child → parent
    * edges): each node's depth below its root — the org-chart /
    * category-tree / BOM unroll a warehouse does with a recursive CTE,
    * expressed as bounded synchronous BFS (Spark has no recursive
    * CTE). Roots (nodes never appearing as a child) are level 0; each
    * pass joins the frontier against the edge list, so the work per
    * pass is one shuffle keyed by parent and the total is
    * O(depth · |edges|). Nodes deeper than `maxDepth` — or on a cycle
    * — simply don't appear (same contract as a depth-bounded CTE).
    *
    * Returns (node, level) for every node within `maxDepth`.
    */
  def hierarchyLevels(edges: DataFrame, childCol: String, parentCol: String,
                      maxDepth: Int = 20): DataFrame = {
    require(maxDepth >= 1, "hierarchyLevels: maxDepth must be >= 1")
    val e = edges.select(col(childCol).cast("string").as("child"),
      col(parentCol).cast("string").as("parent"))
    val nodes = e.select(col("child").as("node"))
      .union(e.select(col("parent").as("node"))).distinct()
    val roots = nodes.join(e.select(col("child").as("node")), Seq("node"), "left_anti")
      .withColumn("level", lit(0))
    var levels = roots
    var frontier = roots
    for (d <- 1 to maxDepth) {
      frontier = e.join(frontier.select(col("node").as("parent")), "parent")
        .select(col("child").as("node"), lit(d).as("level"))
      levels = levels.unionByName(frontier)
    }
    // a forest gives each node one level; min() keeps the contract
    // stable if callers pass a DAG (shortest depth wins, like the
    // UNION-dedup of a recursive CTE)
    levels.groupBy(col("node")).agg(min(col("level")).as("level"))
  }
}
