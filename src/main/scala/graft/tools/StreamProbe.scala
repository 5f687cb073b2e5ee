package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway profiler for the streaming rows: prints per-batch progress
  * durations so the fixed streaming overhead is visible.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit =
        println(s"[probe] query started ${System.nanoTime() / 1e9}")
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        println(s"[probe] batch ${e.progress.batchId} rows=${e.progress.numInputRows} " +
          s"durationMs=${e.progress.durationMs}")
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
        println(s"[probe] query terminated ${System.nanoTime() / 1e9}")
    })

    val qname = if (args.nonEmpty) args(0) else "q_stream_running_stats"
    val t0 = System.nanoTime()
    val df = graft.SparkEntry.queries(qname)(spark, sfDir)
    df.count()
    println(s"[probe] $qname total: ${(System.nanoTime() - t0) / 1e9}s")
    Thread.sleep(500) // let listener events drain
    spark.stop()
  }
}
