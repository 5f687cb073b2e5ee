package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-shape audit: print `explain("formatted")` for selected registered
  * queries (all of them with no name args). Driver-side tooling for the
  * SCALE.md review loop — grep the output for CartesianProduct /
  * missing PushedFilters / unexpected Exchange.
  *
  * usage: runMain graft.tools.PlanAudit <sfDir> [name ...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.drop(1).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.isEmpty || names.contains(n) }
      .foreach { case (n, fn) =>
        println(s"\n==== $n ====")
        try println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        catch { case e: Throwable => println(s"[audit] $n failed: ${e.getMessage}") }
      }
    spark.stop()
  }
}
