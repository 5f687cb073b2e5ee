package graft

import java.time.LocalDateTime

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.pipeline.{EtlPipeline, Transform}
import graft.sink.Sinks

/** CLI parity with the reference's `run-et-etl.py` entry point
  * (`ET-ETL-DWH-PY312/run-et-etl.py:130-176`): a user who drove the
  * reference with cron flags can drive this engine the same way.
  *
  * {{{
  * runMain graft.RunEtl --input <dir-of-entity-json> --warehouse <dir>
  *   [--start-dt YYYY-MM-DD] [--stop-dt YYYY-MM-DD]   # backfill window (EP2)
  *   [--load-to parquet|csv|tsv|json]                  # file sink instead of warehouse
  *   [--out <dir>]                                     # file-sink target
  *   [--test-mode] [--test-limit N]                    # cap sessions (settings.py:18-19)
  *   [--daily]                                         # run incremental pass too (EP1 step 5)
  * }}}
  *
  * `--input` holds one JSON file per entity (agents.json, ... ,
  * sessions.json) — the shape the reference's Extract step produces.
  */
object RunEtl {

  private val dictNames =
    Seq("agents", "scorecards", "groups", "labels", "categories", "tags", "users")

  def main(args: Array[String]): Unit = {
    val opts = parseArgs(args)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-etl")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, opts)
    finally spark.stop()
  }

  final case class Opts(
      input: String = "",
      warehouse: String = "",
      startDt: Option[String] = None,
      stopDt: Option[String] = None,
      loadTo: Option[String] = None,
      out: Option[String] = None,
      testMode: Boolean = false,
      testLimit: Int = 200, // settings.py:19
      daily: Boolean = false)

  def parseArgs(args: Array[String]): Opts = {
    @annotation.tailrec
    def loop(rest: List[String], o: Opts): Opts = rest match {
      case "--input" :: v :: t => loop(t, o.copy(input = v))
      case "--warehouse" :: v :: t => loop(t, o.copy(warehouse = v))
      case "--start-dt" :: v :: t => loop(t, o.copy(startDt = Some(v)))
      case "--stop-dt" :: v :: t => loop(t, o.copy(stopDt = Some(v)))
      case "--load-to" :: v :: t => loop(t, o.copy(loadTo = Some(v)))
      case "--out" :: v :: t => loop(t, o.copy(out = Some(v)))
      case "--test-mode" :: t => loop(t, o.copy(testMode = true))
      case "--test-limit" :: v :: t => loop(t, o.copy(testLimit = v.toInt))
      case "--daily" :: t => loop(t, o.copy(daily = true))
      case Nil => o
      case other :: _ => throw new IllegalArgumentException(s"unknown arg: $other")
    }
    val o = loop(args.toList, Opts())
    require(o.input.nonEmpty, "--input is required")
    require(o.warehouse.nonEmpty || o.loadTo.isDefined,
      "--warehouse or --load-to is required")
    require(o.loadTo.isEmpty || o.out.isDefined || o.warehouse.nonEmpty,
      "--load-to needs --out (or --warehouse) as the target directory")
    o
  }

  def run(spark: SparkSession, opts: Opts): Unit = {
    def readEntity(name: String): Option[DataFrame] = {
      val f = new java.io.File(s"${opts.input}/$name.json")
      if (f.exists()) Some(spark.read.option("multiLine", "true").json(f.getPath))
      else None
    }

    val dicts = dictNames.flatMap(n => readEntity(n).map(n -> _)).toMap
    val sessionsOpt = readEntity("sessions")

    // backfill window (EP2, run-et-etl.py:170-190): filter on the
    // PARSED start_dt (salvaging corrupted strings like Transform does
    // — a lexicographic string compare would silently drop exactly the
    // rows the salvage path exists to keep)
    val windowed = sessionsOpt.map { sessions0 =>
      (opts.startDt, opts.stopDt) match {
        case (None, None) => sessions0
        case (s, e) =>
          import org.apache.spark.sql.functions.{col, lit}
          val ts = graft.ops.Cleanse.tsParseSalvaged(col("start_dt").cast("string"))
          val withStart = s.map(v => ts >= lit(v).cast("timestamp"))
          val withStop = e.map(v => ts < lit(v).cast("timestamp"))
          (withStart ++ withStop).reduceOption(_ && _)
            .map(sessions0.filter).getOrElse(sessions0)
      }
    }
    // test-mode cap (run-et-etl.py:146-168, Extract.py:30-31)
    val sessions = windowed.map(w => if (opts.testMode) w.limit(opts.testLimit) else w)

    opts.loadTo match {
      case Some(fmt) =>
        // EP2 file-sink variant (Load.py:186-224); absent sessions.json
        // → dims only (the reference's base-dicts-only mode)
        val out = opts.out.getOrElse(opts.warehouse)
        sessions.foreach { sess =>
          val t = Transform.sessions(sess)
          val range = (opts.startDt.getOrElse("begin"), opts.stopDt.getOrElse("end"))
          // EVERY frame of the session payload goes to the sink, like
          // the reference's load2file writing all of et_data — not just
          // the flattened fact
          def fw(name: String, df: DataFrame): Unit =
            Sinks.write(df, s"$out/${Sinks.factFileName(name, range._1, range._2)}", fmt)
          fw("sessions", t.sessions)
          fw("sessions_tags", t.tags)
          fw("sessions_categories", t.categories)
          fw("sessions_reviewers", t.reviewers)
          t.scores.foreach(fw("sessions_scores", _))
          fw("sessions_comments", t.comments.drop("comment_pos"))
          fw("sessions_summaries", t.summaries)
          fw("sessions_crm_statuses", t.crmStatuses)
        }
        dicts.foreach { case (n, df) =>
          Sinks.write(df.drop(dictChildCols(n): _*), s"$out/${Sinks.dimFileName(n)}", fmt)
        }
      case None =>
        val pipe = new EtlPipeline(spark, opts.warehouse)
        val wm = s"${opts.warehouse}/_meta/last_synced"
        // capture the PREVIOUS watermark before runDaily advances it —
        // the incremental changed-dim pass compares against last sync,
        // not against the timestamp runDaily just wrote
        val prevWm = graft.sync.Incremental.readWatermark(wm)
        pipe.syncBaseDicts(dicts)
        sessions.foreach(pipe.syncSessions)
        graft.sync.Incremental.writeWatermark(wm, LocalDateTime.now())
        if (opts.daily) sessions.foreach(sess =>
          pipe.runIncremental(sess, wm, LocalDateTime.now(), since = Some(prevWm)))
    }
  }

  /** nested child columns that can't go to flat file sinks */
  private def dictChildCols(name: String): Seq[String] = name match {
    case "agents" => Seq("groups", "user", "reactions", "phone_number_aliases")
    case "scorecards" => Seq("categories", "team_ids")
    case "categories" => Seq("labels")
    case "tags" => Seq("labels", "words", "phrases", "color")
    case "users" => Seq("role_ids", "permissions")
    case "groups" => Seq("additional_scorecards")
    case _ => Seq.empty
  }
}
