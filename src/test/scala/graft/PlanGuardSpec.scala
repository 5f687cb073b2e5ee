package graft

/** Plan-shape regression guard: no registered query may plan a
  * CartesianProduct — the one join shape that cannot survive a 100×
  * scale-up. Broadcast nested-loop joins are allowed (they are the
  * INTENTIONAL shape for tiny-side cross joins: centroid ranking,
  * query broadcast, band dimensions); an unbroadcast cartesian is not.
  *
  * Streaming rows are excluded — their builders EXECUTE the stream as
  * a side effect, and their batch plans are covered by the equivalent
  * batch queries (q50, q33) plus StreamSyncSpec.
  */
class PlanGuardSpec extends SparkSpec {

  private val excluded = Set(
    "q_stream_windowed_counts", // executes a stream in the builder
    "q_stream_running_stats",   // executes a stream in the builder
    "q_stream_dedup",           // executes a stream in the builder
    "q_stream_interval_join",   // executes a stream in the builder
    "q_stream_paged"            // executes a stream in the builder
  )

  // same resolution as Bench: env override first, driver layout as the
  // default — and skip (not error) on a checkout without the testdata
  private val sfDir =
    sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

  private def offendersAt(dir: String): Seq[String] =
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (name, _) => excluded.contains(name) }
      .flatMap { case (name, fn) =>
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) Some(name) else None
      }

  test("no registered query plans a CartesianProduct at sf0.001") {
    assume(new java.io.File(sfDir).isDirectory, s"testdata absent: $sfDir")
    val offenders = offendersAt(sfDir)
    assert(offenders.isEmpty,
      s"queries planning CartesianProduct: ${offenders.mkString(", ")}")
  }

  test("no registered query plans a CartesianProduct at sf0.1") {
    // plan shapes can flip with statistics (a small side that fit the
    // broadcast threshold at sf0.001 may not at sf0.1, turning an
    // intentional BNL join into a cartesian) — guard the bigger SF too
    val big = "/root/testdata/sf0.1"
    assume(new java.io.File(big).isDirectory, s"testdata absent: $big")
    val offenders = offendersAt(big)
    assert(offenders.isEmpty,
      s"queries planning CartesianProduct at sf0.1: ${offenders.mkString(", ")}")
  }
}
