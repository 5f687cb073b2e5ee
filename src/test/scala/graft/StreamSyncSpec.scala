package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamSync

class StreamSyncSpec extends SparkSpec {

  test("windowedCounts aggregates tumbling event-time windows with watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val agg = StreamSync.windowedCounts(events, "ts", "10 minutes", "1 hour")
    val q = agg.writeStream.format("memory").queryName("wc").outputMode("update").start()
    try {
      input.addData(
        (Timestamp.valueOf("2024-01-01 00:01:00"), "click", 1.0),
        (Timestamp.valueOf("2024-01-01 00:05:00"), "click", 2.0),
        (Timestamp.valueOf("2024-01-01 00:11:00"), "view", 5.0))
      q.processAllAvailable()
      val out = spark.table("wc")
        .select(col("window.start").cast("string").as("w"), col("event_type"), col("n"), col("total_value"))
        .orderBy("w", "event_type")
        .as[(String, String, Long, Double)].collect()
      assert(out === Array(
        ("2024-01-01 00:00:00", "click", 2L, 3.0),
        ("2024-01-01 00:10:00", "view", 1L, 5.0)))
    } finally q.stop()
  }

  test("streamIntervalJoin pairs events within tolerance, per key") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, String)]
    val views = MemoryStream[(Long, Timestamp, String)]
    val joined = StreamSync.streamIntervalJoin(
      clicks.toDF().toDF("user_id", "c_ts", "click_id"),
      views.toDF().toDF("user_id", "v_ts", "view_id"),
      "user_id", "c_ts", "v_ts", tolerance = "10 minutes", lateness = "1 hour")
    val q = joined.writeStream.format("memory").queryName("ssj").outputMode("append").start()
    try {
      clicks.addData(
        (1L, Timestamp.valueOf("2024-01-01 10:00:00"), "c1"),
        (2L, Timestamp.valueOf("2024-01-01 10:00:00"), "c2"))
      views.addData(
        (1L, Timestamp.valueOf("2024-01-01 10:05:00"), "v1"), // within 10 min
        (1L, Timestamp.valueOf("2024-01-01 11:00:00"), "v2"), // outside
        (2L, Timestamp.valueOf("2024-01-01 09:55:00"), "v3")) // within (before)
      q.processAllAvailable()
      val out = spark.table("ssj").select("user_id", "click_id", "view_id")
        .orderBy("user_id").as[(Long, String, String)].collect()
      assert(out === Array((1L, "c1", "v1"), (2L, "c2", "v3")))
    } finally q.stop()
  }

  test("watermark drops events later than the lateness bound") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    // 10-min windows, 30-min tolerated lateness, append mode so a
    // window only emits once finalized by the watermark
    val agg = StreamSync.windowedCounts(events, "ts", "10 minutes", "30 minutes")
    val q = agg.writeStream.format("memory").queryName("late").outputMode("append").start()
    try {
      input.addData((Timestamp.valueOf("2024-01-01 00:05:00"), "click", 1.0))
      q.processAllAvailable()
      // advance event time far enough to finalize the 00:00 window
      input.addData((Timestamp.valueOf("2024-01-01 02:00:00"), "click", 1.0))
      q.processAllAvailable()
      // this event is 2h late, far beyond the 30-min bound -> dropped
      input.addData((Timestamp.valueOf("2024-01-01 00:06:00"), "click", 99.0))
      q.processAllAvailable()
      input.addData((Timestamp.valueOf("2024-01-01 04:00:00"), "click", 1.0))
      q.processAllAvailable()
      val w0 = spark.table("late")
        .filter(col("window.start") === Timestamp.valueOf("2024-01-01 00:00:00"))
        .select("n", "total_value").as[(Long, Double)].collect()
      // the finalized 00:00 window holds only the on-time event
      assert(w0 === Array((1L, 1.0)))
    } finally q.stop()
  }

  test("dedupWithinWatermark drops in-window duplicates, passes distinct keys") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val events = input.toDF().toDF("k", "ts", "payload")
    val deduped = StreamSync.dedupWithinWatermark(events, "ts", "1 hour", Seq("k"))
    val q = deduped.writeStream.format("memory").queryName("sdd").outputMode("append").start()
    try {
      // same batch: duplicate of k=1 dropped, k=2 kept
      input.addData(
        (1L, Timestamp.valueOf("2024-01-01 00:00:00"), "first"),
        (1L, Timestamp.valueOf("2024-01-01 00:10:00"), "dup-in-batch"),
        (2L, Timestamp.valueOf("2024-01-01 00:20:00"), "other"))
      q.processAllAvailable()
      // next batch, still within the watermark window: dup dropped again
      input.addData((1L, Timestamp.valueOf("2024-01-01 00:30:00"), "dup-next-batch"))
      q.processAllAvailable()
      val out = spark.table("sdd").select("k", "payload")
        .as[(Long, String)].collect().sortBy(_._1)
      assert(out === Array((1L, "first"), (2L, "other")))
    } finally q.stop()
  }

  test("runningUserStats accumulates custom state across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // transformWithState requires the RocksDB state store provider
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[StreamSync.UserEvent]
    val stats = StreamSync.runningUserStats(input.toDS())
    val q = stats.writeStream.format("memory").queryName("ustats")
      .outputMode("update").start()
    try {
      input.addData(
        StreamSync.UserEvent(1L, Timestamp.valueOf("2024-01-01 00:00:00"), 2.0),
        StreamSync.UserEvent(1L, Timestamp.valueOf("2024-01-01 00:01:00"), 3.0),
        StreamSync.UserEvent(2L, Timestamp.valueOf("2024-01-01 00:02:00"), 5.0))
      q.processAllAvailable()
      input.addData(
        StreamSync.UserEvent(1L, Timestamp.valueOf("2024-01-01 00:05:00"), 10.0))
      q.processAllAvailable()
      // memory sink in update mode appends each emitted update; take the
      // latest row per user
      val m = spark.table("ustats")
        .orderBy(col("nEvents").desc)
        .as[StreamSync.UserStats].collect()
      val u1 = m.filter(_.userId == 1L).maxBy(_.nEvents)
      val u2 = m.filter(_.userId == 2L).maxBy(_.nEvents)
      assert(u1.nEvents === 3L && u1.totalValue === 15.0)
      assert(u1.lastSeen === Timestamp.valueOf("2024-01-01 00:05:00"))
      assert(u2.nEvents === 1L && u2.totalValue === 5.0)
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("upsertSink merges each micro-batch into the parquet target (source wins)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-upsert").toString
    val target = s"$dir/t"
    // seed the target with an existing row the stream will overwrite
    Seq((1, "old", "2024-01-01")).toDF("id", "v", "day")
      .write.partitionBy("day").parquet(target)
    val input = MemoryStream[(Int, String, String)]
    val updates = input.toDF().toDF("id", "v", "day")
    val q = StreamSync.upsertSink(updates, target, Seq("id"), "day",
      s"$dir/ckpt", org.apache.spark.sql.streaming.Trigger.AvailableNow())
    input.addData((1, "new", "2024-01-01"), (2, "ins", "2024-01-02"))
    q.awaitTermination(60000)
    val out = spark.read.parquet(target).orderBy("id")
      .select("id", "v").as[(Int, String)].collect()
    assert(out === Array((1, "new"), (2, "ins")))
  }

  test("upsertSink: empty batches never touch the target (documented contract)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-empty").toString
    val target = s"$dir/t"
    val input = MemoryStream[(Int, String, String)]
    // every row filtered out -> the micro-batch reaching the sink is
    // EMPTY. Contract: the target appears only at the first non-empty
    // batch (an empty PARTITIONED parquet table cannot carry a schema),
    // so after an all-empty stream the target must NOT exist — and an
    // existing target must be byte-untouched by later empty batches.
    val updates = input.toDF().toDF("id", "v", "day").filter(col("id") < 0)
    val q = StreamSync.upsertSink(updates, target, Seq("id"), "day",
      s"$dir/ckpt", org.apache.spark.sql.streaming.Trigger.AvailableNow())
    input.addData((1, "dropped", "2024-01-01"))
    q.awaitTermination(60000)
    assert(!new java.io.File(target).exists())
  }

  test("sessionize groups events by inactivity gap per user") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Double)]
    val events = input.toDF().toDF("ts", "user_id", "value")
    val agg = StreamSync.sessionize(events, "ts", "user_id", "5 minutes", "1 hour")
    // session_window aggregation rejects update mode — complete is the
    // natural mode for this small test sink
    val q = agg.writeStream.format("memory").queryName("sess").outputMode("complete").start()
    try {
      input.addData(
        (Timestamp.valueOf("2024-01-01 00:00:00"), 1L, 1.0),
        (Timestamp.valueOf("2024-01-01 00:02:00"), 1L, 1.0), // same session
        (Timestamp.valueOf("2024-01-01 01:00:00"), 1L, 1.0)) // new session
      q.processAllAvailable()
      val out = spark.table("sess").select("user_id", "n_events")
        .orderBy(col("n_events").desc).as[(Long, Long)].collect()
      assert(out === Array((1L, 2L), (1L, 1L)))
    } finally q.stop()
  }

  test("session_window MERGES two events exactly gap apart — pins the " +
       "q_stream_sessionize oracle's <= boundary") {
    // The lag-based gap-islands oracle merges when
    // `tss - lag(tss) <= gap`. Spark's session_window treats the
    // half-open windows [t, t+gap) and [t+gap, t+2gap) as mergeable
    // (end-touching counts as overlap), so an event at exactly
    // last_event + gap EXTENDS the session. ts in the events table is
    // second-truncated, so an exact 1800 s gap is reachable in real
    // data — this boundary must stay aligned on both sides of the
    // differential. Measured on Spark 4.1.2; if an upgrade flips this
    // to a split, the oracle must move from <= to <.
    import spark.implicits._
    val two = Seq(
      ("u", Timestamp.valueOf("2024-01-01 10:00:00"), 1.0),
      ("u", Timestamp.valueOf("2024-01-01 10:30:00"), 1.0))
      .toDF("user_id", "tss", "value")
    val engine = two
      .groupBy(session_window(col("tss"), "30 minutes"), col("user_id"))
      .agg(count("*").as("n"))
      .select(col("session_window.start").cast("string").as("s"),
        col("session_window.end").cast("string").as("e"), col("n"))
      .collect()
    assert(engine.length === 1, "session_window must merge an exact-gap event")
    assert(engine(0).getString(0) === "2024-01-01 10:00:00")
    assert(engine(0).getString(1) === "2024-01-01 11:00:00")
    assert(engine(0).getLong(2) === 2L)
    // the oracle replayed in Spark SQL (same <= the DuckDB side uses)
    two.createOrReplaceTempView("boundary_events")
    val oracle = spark.sql(
      """WITH flagged AS (
        |  SELECT user_id, tss,
        |    CASE WHEN tss - lag(tss) OVER (PARTITION BY user_id ORDER BY tss)
        |              <= INTERVAL 30 MINUTE
        |         THEN 0 ELSE 1 END AS new_sess
        |  FROM boundary_events),
        |numbered AS (
        |  SELECT user_id, tss,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY tss
        |                        ROWS UNBOUNDED PRECEDING) AS sess_id
        |  FROM flagged)
        |SELECT CAST(min(tss) AS STRING) AS s,
        |  CAST(max(tss) + INTERVAL 30 MINUTE AS STRING) AS e,
        |  count(*) AS n
        |FROM numbered GROUP BY user_id, sess_id""".stripMargin).collect()
    assert(oracle.length === 1)
    assert(oracle(0).getString(0) === engine(0).getString(0))
    assert(oracle(0).getString(1) === engine(0).getString(1))
    assert(oracle(0).getLong(2) === engine(0).getLong(2))
  }
}
