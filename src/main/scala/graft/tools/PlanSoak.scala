package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-stability soak: run registered queries against an SF dir and
  * print wall time plus a join-strategy fingerprint of the FINAL
  * (post-AQE) physical plan. Diffing the fingerprints between sf0.1 and
  * a 10× [[ScaleUp]] dir surfaces broadcast→SMJ flips, AQE re-plans,
  * and any CartesianProduct that only appears with real statistics at
  * scale — the failure class PlanGuardSpec's small SFs cannot see.
  *
  * usage: runMain graft.tools.PlanSoak <sfDir> <query> [query ...]
  */
object PlanSoak {
  private val marks = Seq(
    "bhj" -> "BroadcastHashJoin", "smj" -> "SortMergeJoin",
    "shj" -> "ShuffledHashJoin", "bnl" -> "BroadcastNestedLoopJoin",
    "cart" -> "CartesianProduct", "aqe" -> "AdaptiveSparkPlan")

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanSoak <sfDir> <query> [query ...]")
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("graft-plansoak").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    try graft.registry.Fixtures.sessionsRaw(spark, sfDir).count()
    catch { case _: Throwable => () }

    // "ALL" expands to the full registry minus the streaming rows
    // (their work happens inside foreachBatch — there is no single
    // final batch plan to fingerprint, and their scale story is the
    // state-store probe, not a join-strategy diff)
    val names =
      if (args.drop(1).toSeq == Seq("ALL"))
        graft.SparkEntry.queries.keys.toSeq.sorted.filterNot(_.startsWith("q_stream"))
      else args.drop(1).toSeq
    for (q <- names) {
      try {
        val df = graft.SparkEntry.queries(q)(spark, sfDir)
        val qe = df.queryExecution
        val t0 = System.nanoTime()
        // execute THIS QueryExecution: df.count() would build a fresh
        // one for the groupBy().count() dataset and leave qe's
        // AdaptiveSparkPlanExec un-executed, so its toString would show
        // the INITIAL plan — exactly the pre-AQE view this tool exists
        // to see through. toRdd.count() runs qe's own physical plan to
        // completion; the fingerprint below is then the FINAL plan.
        qe.toRdd.count()
        val sec = (System.nanoTime() - t0) / 1e9
        val plan = qe.executedPlan.toString
        val fp = marks.map { case (k, m) =>
          s"$k=${m.r.findAllMatchIn(plan).size}"
        }.mkString(" ")
        println(f"[plansoak] sf=$sfDir q=$q sec=$sec%.2f $fp")
      } catch {
        case t: Throwable =>
          println(s"[plansoak] sf=$sfDir q=$q FAILED: ${t.getClass.getSimpleName}: ${t.getMessage}")
      }
    }
    spark.stop()
  }
}
