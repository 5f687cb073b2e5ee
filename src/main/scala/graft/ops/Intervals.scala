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

  /** Point-in-interval join by BINNING — the shape that scales when the
    * interval side is too large to broadcast. A plain `p >= lo AND
    * p < hi` join plans as a nested-loop (broadcast at best, cartesian
    * at worst: O(|points|·|intervals|) comparisons). Here each interval
    * explodes into the fixed-width bins it covers and each point
    * computes its single bin, so the join is an EQUI-join on bin (plus
    * `extraKeys`, when matches must also share e.g. a tenant id) that
    * shuffles by bin and compares only co-binned pairs. The exact
    * half-open predicate re-filters after the join, so bin-edge
    * over-coverage never leaks a wrong pair — binning is purely a
    * pruning strategy, results are EXACTLY the predicate's.
    *
    * Each matching pair survives in exactly ONE bin (the point's), so
    * no dedup pass is needed. Pick `binSize` near the typical interval
    * width: bins per interval ≈ width/binSize + 1 rows of explode
    * (guarded by `maxBinsPerInterval`), comparisons per point ≈
    * intervals overlapping its bin. The classic bin-join described for
    * interval/range joins in the literature (e.g. the "range join
    * optimization" in Spark-ecosystem engines), built from explode +
    * equi-join so Catalyst plans a plain shuffled hash/sort-merge join.
    */
  /** Interval×interval OVERLAP join by binning — same scale rationale
    * as [[binnedPointJoin]], for the case where BOTH sides are spans
    * (meeting-overlap detection, session×incident correlation,
    * genomic-style range intersection). Overlap means
    * `a.lo < b.hi AND b.lo < a.hi` (half-open spans). Both sides
    * explode into covered bins and equi-join on (bin, extraKeys); an
    * overlapping pair co-occurs in EVERY shared bin, so the join keeps
    * only the CANONICAL bin — the one holding `greatest(a.lo, b.lo)`,
    * the overlap's start — which each pair has exactly once: exact
    * dedup with a codegen'd comparison instead of a distinct shuffle
    * over the (potentially huge) pair set.
    */
  def binnedIntervalJoin(left: DataFrame, leftLo: String, leftHi: String,
                         right: DataFrame, rightLo: String, rightHi: String,
                         binSize: Double, extraKeys: Seq[String] = Seq.empty,
                         maxBinsPerInterval: Long = 100000L): DataFrame = {
    require(binSize > 0, "binnedIntervalJoin: binSize must be positive")
    def explodeBins(df: DataFrame, lo: String, hi: String): DataFrame = df
      .withColumn("__b0", floor(col(lo) / binSize).cast("long"))
      .withColumn("__b1", floor(col(hi) / binSize).cast("long"))
      .withColumn("__guard",
        when(col("__b1") - col("__b0") < maxBinsPerInterval, lit(true))
          .otherwise(raise_error(concat(lit("binnedIntervalJoin: interval ["),
            col(lo).cast("string"), lit(", "), col(hi).cast("string"),
            lit(s") covers more than $maxBinsPerInterval bins — raise binSize")))))
      .where(col("__guard"))
      .withColumn("__bin", explode(sequence(col("__b0"), col("__b1"))))
      .drop("__b0", "__b1", "__guard")
    val l = explodeBins(left, leftLo, leftHi)
    val r = explodeBins(right, rightLo, rightHi)
    l.join(r, Seq("__bin") ++ extraKeys)
      .where(col(leftLo) < col(rightHi) && col(rightLo) < col(leftHi))
      // canonical bin: the one containing the overlap's start
      .where(col("__bin") ===
        floor(greatest(col(leftLo), col(rightLo)) / binSize).cast("long"))
      .drop("__bin")
  }

  def binnedPointJoin(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      binSize: Double, extraKeys: Seq[String] = Seq.empty,
                      maxBinsPerInterval: Long = 100000L): DataFrame = {
    require(binSize > 0, "binnedPointJoin: binSize must be positive")
    val ivb = intervals
      .withColumn("__b0", floor(col(loCol) / binSize).cast("long"))
      .withColumn("__b1", floor(col(hiCol) / binSize).cast("long"))
      .withColumn("__guard",
        when(col("__b1") - col("__b0") < maxBinsPerInterval, lit(true))
          .otherwise(raise_error(concat(lit("binnedPointJoin: interval ["),
            col(loCol).cast("string"), lit(", "), col(hiCol).cast("string"),
            lit(s") covers more than $maxBinsPerInterval bins — raise binSize")))))
      .where(col("__guard"))
      .withColumn("__bin", explode(sequence(col("__b0"), col("__b1"))))
      .drop("__b0", "__b1", "__guard")
    val pb = points.withColumn("__bin", floor(col(pointCol) / binSize).cast("long"))
    pb.join(ivb, Seq("__bin") ++ extraKeys)
      .where(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bin")
  }
}
