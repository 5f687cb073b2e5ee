package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval algebra over keyed (start, end] spans: merge overlapping —
  * or near-adjacent, within `maxGap` — intervals into islands, one
  * output row per island. The union-of-time-ranges operator behind
  * "total on-call coverage", "stitch call legs into conversations",
  * "effective session span" — a gaps-and-islands computation the
  * reference's pandas layer would do with sort + cumsum.
  *
  * Scale shape: ONE shuffle (hash by key) + per-key sort inside the
  * window; island assignment is two window functions (running max of
  * end, then a running sum over the new-island flag); the final rollup
  * groups on (key, island) which is a narrow re-aggregation of the
  * same partitioning — Catalyst reuses the exchange. No self-join, no
  * interval explosion.
  */
object Intervals {

  /** One row per merged island: key, island start/end, spans merged,
    * covered = island_end - island_start (a true union: overlaps merge).
    *
    * Start/end are NUMERIC (epoch seconds/millis/micros — pick one
    * unit and pass `maxGap` in it); cast timestamps with
    * `unix_timestamp`/`unix_micros` upstream so gap arithmetic stays
    * unit-explicit.
    *
    * Intervals with null start are dropped (unanchored); a null end is
    * treated as a point interval at start. `end < start` rows are
    * rejected by filter (data bugs, not silently swallowed — count
    * them upstream with `Validate`).
    */
  def mergeOverlapping(
      df: DataFrame, keyCol: String, startCol: String, endCol: String,
      maxGap: Long = 0L): DataFrame = {
    val in = df
      .filter(col(startCol).isNotNull)
      .withColumn("__end", greatest(coalesce(col(endCol), col(startCol)), col(startCol)))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(startCol), col("__end"))
    // furthest end seen BEFORE this row (strictly preceding frame);
    // null for the first row of the key = always a new island
    val prevMax = max(col("__end")).over(
      w.rowsBetween(Window.unboundedPreceding, -1))
    val flagged = in
      .withColumn("__new_island",
        when(prevMax.isNull || col(startCol) > prevMax + maxGap, 1).otherwise(0))
      .withColumn("__island", sum(col("__new_island")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged
      .groupBy(col(keyCol), col("__island"))
      .agg(
        min(col(startCol)).as("island_start"),
        max(col("__end")).as("island_end"),
        count(lit(1)).as("n_spans"))
      .withColumn("covered", col("island_end") - col("island_start"))
      .select(col(keyCol), col("island_start"), col("island_end"),
        col("n_spans"), col("covered"))
      .orderBy(col(keyCol), col("island_start"))
  }

  /** Per-key coverage rollup: total covered units and island count —
    * the dashboard figure over [[mergeOverlapping]]'s islands.
    */
  def coverage(df: DataFrame, keyCol: String, startCol: String, endCol: String,
               maxGap: Long = 0L): DataFrame =
    mergeOverlapping(df, keyCol, startCol, endCol, maxGap)
      .groupBy(col(keyCol))
      .agg(sum(col("covered")).as("total_covered"),
        count(lit(1)).as("n_islands"),
        max(col("n_spans")).as("max_island_spans"))
      .orderBy(col(keyCol))
}
