package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query names (local iteration);
    // the driver's two-arg invocation runs everything
    val (sfDir, outDir, only) = args match {
      case Array(a, b)    => (a, b, Option.empty[Set[String]])
      case Array(a, b, c) => (a, b, Some(c.split(",").toSet))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // hoist the nanos-parquet conf so concurrent query threads never
    // race on session config (events() also sets it, idempotently)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    new java.io.File(outDir).mkdirs()
    // run queries concurrently — Spark schedules independent jobs from
    // multiple threads fine, and the small queries pipeline behind the
    // big ones instead of serializing
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    // a failed query must leave a durable trace, not just a stderr line:
    // in r8 six queries threw, vanished from the correctness suite
    // without any recorded failure, and the gap was only caught by the
    // judge diffing round-over-round coverage
    val failures = new java.util.concurrent.ConcurrentHashMap[String, String]()
    // per-row wall time (seconds, includes the parquet dump): free
    // timing evidence on every gate run — a 10x verify then carries its
    // own per-row trend, so a "did this row get slower at scale" question
    // is answered from the artifact instead of a fresh soak. Rows run
    // 4-concurrent, so these are shared-JVM numbers: fine for trend and
    // outlier-spotting, adjudicate suspects isolated as always.
    val timings = new java.util.concurrent.ConcurrentHashMap[String, Double]()
    val futures = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      scala.concurrent.Future {
        // clear any previous run's output FIRST: overwrite only happens on
        // success, so a reused out-dir would otherwise leave stale parquet
        // that downstream compares mistake for current output
        val dest = new java.io.File(s"$outDir/$name")
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        if (dest.exists()) rm(dest)
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          timings.put(name, (System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          failures.put(name,
            Option(e.getMessage).getOrElse(e.getClass.getName).take(300))
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    }
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futures),
      scala.concurrent.duration.Duration.Inf)
    pool.shutdown()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    import scala.jdk.CollectionConverters._
    val failJson = failures.asScala.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/verify_failures.json"), failJson)
    val timeJson = timings.asScala.toSeq.sortBy(_._1)
      .map { case (k, v) =>
        s"${q(k)}: ${String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))}"
      }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/verify_timings.json"), timeJson)
    // input-schema manifest: the driver regenerates the testdata between
    // rounds and physical types have already rotated once (events.ts
    // TIMESTAMP(NANOS) → NTZ micros, which silently broke six queries in
    // r8). Recording what this run actually read makes the next rotation
    // a visible artifact diff instead of an archaeology exercise.
    val observed = Option(new java.io.File(sfDir).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
      .map { f =>
        val tbl = f.getName.stripSuffix(".parquet")
        val schema =
          try spark.read.parquet(f.getAbsolutePath).schema.simpleString
          catch { case e: Throwable => s"unreadable: ${e.getMessage}" }
        tbl -> schema
      }.toSeq
    val manifest = observed
      .map { case (tbl, schema) => s"${q(tbl)}: ${q(schema)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/schema_manifest.json"), manifest)
    // GATE the manifest against the pinned expectation (warn-level): the
    // r8 testdata type rotation broke six queries silently; a drift row
    // here catches the next one at round start instead of judge review
    val drift = graft.registry.ExpectedSchemas.drift(observed.toMap)
    val driftJson = drift.map { case (tbl, got, accepted) =>
      s"${q(tbl)}: {${q("observed")}: ${q(got)}, ${q("accepted")}: " +
        accepted.toSeq.sorted.map(q).mkString("[", ",", "]") + "}"
    }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/schema_drift.json"), driftJson)
    drift.foreach { case (tbl, got, accepted) =>
      System.err.println(s"[verify] SCHEMA DRIFT: table '$tbl' observed " +
        s"'$got' but pinned variants are ${accepted.mkString("{", " | ", "}")}" +
        " — the driver's testdata generation changed physical types; " +
        "triage Fixtures normalization before trusting this round")
    }
    if (!failures.isEmpty)
      System.err.println(s"[verify] ${failures.size} QUERIES FAILED — " +
        s"see $outDir/verify_failures.json")
    spark.stop()
  }
}
