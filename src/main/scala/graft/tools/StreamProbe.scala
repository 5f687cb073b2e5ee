package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Throwaway profiler for the streaming rows: prints per-batch progress
  * durations so the fixed streaming overhead is visible. The listener is
  * registered via conf (class name) so CLONED sessions — the rows run on
  * `newSession()` to isolate their shuffle/state conf — pick it up too;
  * an instance added to the parent session's manager never sees them.
  */
class ProbeListener extends StreamingQueryListener {
  import StreamingQueryListener._
  override def onQueryStarted(e: QueryStartedEvent): Unit =
    System.err.println(s"[probe] query started ${System.nanoTime() / 1e9}")
  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p = e.progress
    System.err.println(s"[probe] batch ${p.batchId} rows=${p.numInputRows} " +
      s"durationMs=${p.durationMs} stateOps=${p.stateOperators.map(o =>
        s"(rows=${o.numRowsTotal} commitMs=${o.commitTimeMs} memUsed=${o.memoryUsedBytes})").mkString}")
  }
  override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
    System.err.println(s"[probe] query terminated ${System.nanoTime() / 1e9}")
}

object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.streamingQueryListeners", "graft.tools.ProbeListener")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    for (qname <- (if (args.nonEmpty) args.toSeq else Seq("q_stream_running_stats"))) {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(qname)(spark, sfDir)
      df.count()
      System.err.println(s"[probe] $qname total: ${(System.nanoTime() - t0) / 1e9}s")
      Thread.sleep(300) // let listener events drain
    }
    spark.stop()
  }
}
