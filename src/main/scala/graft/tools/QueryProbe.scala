package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Per-query time attribution WITHOUT the UI (it is disabled in the
  * bench): run one registry query exactly the way [[graft.Bench]] times
  * it (`.count()` on the Bench session shape) under a SparkListener
  * that records every job's wall time, stage task totals and shuffle
  * bytes. Prints a per-job table (slowest first) plus the gap between
  * the sum of job times and the end-to-end wall — the DRIVER-side
  * share (planning, collects between jobs, commit waits).
  *
  * usage: runMain graft.tools.QueryProbe <sfDir> <queryName> [reps=2]
  * (rep 1 is the warm-up Bench's median also pays; the table reports
  * the LAST rep so codegen/scan-index warm-up does not pollute the
  * attribution)
  */
object QueryProbe {
  final case class JobRec(id: Int, desc: String, start: Long,
                          var end: Long = 0L,
                          var tasks: Int = 0,
                          var taskTimeMs: Long = 0L,
                          var shufR: Long = 0L, var shufW: Long = 0L,
                          var stages: Int = 0)

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name0 = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("graft-query-probe").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the Bench warm-up (session/codegen/file-index)
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$dir/region.parquet").count()
    try graft.registry.Fixtures.sessionsRaw(spark, dir).count()
    catch { case _: Throwable => () }

    val jobs = mutable.LinkedHashMap[Int, JobRec]()
    val stageToJob = mutable.HashMap[Int, Int]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        jobs(e.jobId) = JobRec(e.jobId, desc, e.time)
        e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.end = e.time)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          val si = e.stageInfo
          stageToJob.get(si.stageId).flatMap(jobs.get).foreach { j =>
            j.stages += 1
            j.tasks += si.numTasks
            j.taskTimeMs += si.taskMetrics.executorRunTime
            j.shufR += si.taskMetrics.shuffleReadMetrics.totalBytesRead
            j.shufW += si.taskMetrics.shuffleWriteMetrics.bytesWritten
          }
        }
    }

    spark.sparkContext.addSparkListener(listener)
    for (name <- name0.split(",").map(_.trim).filter(_.nonEmpty)) {
      val fn = graft.SparkEntry.queries(name)
      var wall = 0.0
      for (r <- 1 to reps) {
        jobs.synchronized { jobs.clear(); stageToJob.clear() }
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        wall = (System.nanoTime() - t0) / 1e9
        println(f"[probe] $name rep=$r rows=$n wall=$wall%.3f s")
      }
      // let the listener bus drain before reading (the bus is async and
      // private API — a short settle sleep is enough for a local probe)
      Thread.sleep(500)
      val recs = jobs.synchronized { jobs.values.toSeq }
      val jobSum = recs.map(j => (j.end - j.start) / 1e3).sum
      println(f"[probe] $name jobs=${recs.size} jobSum=$jobSum%.3f s " +
        f"driverGap=${wall - jobSum}%.3f s (planning/collect/commit)")
      recs.sortBy(j => -(j.end - j.start)).take(30).foreach { j =>
        println(f"[probe]   job=${j.id}%3d ${(j.end - j.start) / 1e3}%7.3f s " +
          f"stages=${j.stages}%2d tasks=${j.tasks}%4d " +
          f"taskTime=${j.taskTimeMs / 1e3}%8.3f s " +
          f"shufR=${j.shufR / 1e6}%8.2f MB shufW=${j.shufW / 1e6}%8.2f MB  ${j.desc.take(90)}")
      }
    }
    spark.stop()
  }
}
