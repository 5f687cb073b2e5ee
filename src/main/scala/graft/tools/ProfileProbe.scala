package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B the column-profile distinct strategy at a given data dir:
  * exact `countDistinct` (the oracle-matched default — Spark plans the
  * multi-distinct Aggregate via EXPAND, one input replica per distinct
  * column, so the pre-shuffle row count is ~(distinct cols + 1)× the
  * table) vs `approx_count_distinct` (HLL sketches, single pass, no
  * expand — the 100 TB path).
  *
  * usage: runMain graft.tools.ProfileProbe <dir> [reps=3]
  */
object ProfileProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("graft-profile-probe").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
    println(s"[probe] rows=${orders.count()}")
    for (exact <- Seq(true, false); r <- 1 to reps) {
      val t0 = System.nanoTime()
      graft.ops.Validate.profile(orders, exactDistinct = exact).collect()
      println(f"[probe] exactDistinct=$exact rep=$r ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
