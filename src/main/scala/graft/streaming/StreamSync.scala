package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.Upsert

/** Structured Streaming upgrade of the batch incremental-sync protocol
  * (SURVEY.md §2.8/§7.4): same semantics as [[graft.sync.Incremental]] —
  * watermark, late-data window, keyed upsert — expressed as readStream →
  * watermark → foreachBatch upsert. The reference's cron-every-5-min
  * batch (`ET-ETL-DWH-PY312/run-et-etl.py:125-127`) becomes a trigger
  * interval; its JSON watermark file becomes the checkpoint dir.
  */
object StreamSync {

  /** File-arrival stream over a directory of parquet drops. */
  def readParquetStream(spark: SparkSession, path: String,
                        schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.readStream.schema(schema).option("maxFilesPerTrigger", 16).parquet(path)

  /** Tumbling-window counts with a late-data watermark — the streaming
    * analog of the daily/half-day sync windows (utils.py:60-79,94-105).
    */
  def windowedCounts(events: DataFrame, tsCol: String, window_ : String,
                     lateness: String): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), window_), col("event_type"))
      .agg(count("*").as("n"), sum("value").as("total_value"))

  /** Upsert sink: each micro-batch merges into the parquet target with
    * source-wins semantics (Load.py:228-231), partition-scoped rewrites
    * (see [[Upsert.upsertPartitioned]]). Exactly-once per key given the
    * checkpoint + idempotent merge.
    */
  def upsertSink(
      updates: DataFrame, tablePath: String, keys: Seq[String],
      partitionCol: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("5 minutes")): StreamingQuery =
    updates.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Upsert.upsertPartitioned(batch.sparkSession, tablePath, batch, keys, partitionCol)
      }
      .start()

  /** Sessionization by inactivity gap — `session_window` built-in; the
    * conversation-analytics analog of grouping events into sessions.
    */
  def sessionize(events: DataFrame, tsCol: String, userCol: String,
                 gap: String, lateness: String): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(session_window(col(tsCol), gap), col(userCol))
      .agg(count("*").as("n_events"), sum("value").as("total_value"))
}
