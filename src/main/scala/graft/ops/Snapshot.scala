package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot differencing — change-data-capture between two versions of
  * a keyed table: which rows appeared, vanished, or changed, and WHICH
  * columns changed. The audit/debug companion to `Upsert` (what did
  * yesterday's sync actually do?) and the input generator for
  * downstream incremental consumers (Q52-style fact invalidation
  * driven by a dimension diff).
  *
  * Scale shape: ONE full-outer shuffle join on the key — both sides
  * shuffle once, comparison is a codegen'd null-safe column scan, no
  * row explosion. Unchanged rows (the overwhelming majority of a
  * daily snapshot pair) are filtered before anything downstream sees
  * them.
  */
object Snapshot {

  /** Diff `oldDf` → `newDf` on `keys`. Output: key columns ++
    *   op           'I' (insert: key only in new), 'D' (delete: only
    *                in old), 'U' (update: present in both, any non-key
    *                column differing under null-safe equality)
    *   changed_cols comma-joined sorted names of differing columns
    *                ('' for I/D — the whole row appeared/vanished)
    * Unchanged rows are dropped. Key columns must be non-null on both
    * sides (they identify rows); both snapshots must share the schema —
    * reconcile with `Upsert.reconcileSchema` first if they drifted.
    */
  def diff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "diff needs at least one key column")
    val cols = oldDf.columns.toSeq
    require(newDf.columns.toSeq == cols,
      s"diff: schemas differ (old=${cols.mkString(",")} new=${newDf.columns.mkString(",")})")
    val payload = cols.filterNot(keys.contains)
    val o = oldDf.select(cols.map(c => col(c).as(s"__o_$c")): _*)
      .withColumn("__in_old", lit(true))
    val n = newDf.select(cols.map(c => col(c).as(s"__n_$c")): _*)
      .withColumn("__in_new", lit(true))
    val joined = o.join(n,
      keys.map(k => col(s"__o_$k") === col(s"__n_$k")).reduce(_ && _),
      "full_outer")
    val inOld = col("__in_old").isNotNull
    val inNew = col("__in_new").isNotNull
    val anyChange =
      if (payload.isEmpty) lit(false)
      else payload.map(c => !(col(s"__o_$c") <=> col(s"__n_$c"))).reduce(_ || _)
    val changedList =
      if (payload.isEmpty) lit("")
      else concat_ws(",", payload.sorted.map(c =>
        when(!(col(s"__o_$c") <=> col(s"__n_$c")), lit(c))): _*)
    joined
      .withColumn("op",
        when(inOld && !inNew, lit("D"))
          .when(!inOld && inNew, lit("I"))
          .when(anyChange, lit("U")))
      .filter(col("op").isNotNull)
      .withColumn("changed_cols", when(col("op") === "U", changedList).otherwise(lit("")))
      .select(keys.map(k => coalesce(col(s"__n_$k"), col(s"__o_$k")).as(k)) ++
        Seq(col("op"), col("changed_cols")): _*)
  }

  /** Dashboard rollup of [[diff]]: row counts per op. */
  def diffSummary(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String]): DataFrame =
    diff(oldDf, newDf, keys)
      .groupBy(col("op")).agg(count(lit(1)).as("n")).orderBy("op")

  /** Full-row change feed: [[diff]] plus the payload needed to REPLAY
    * each change downstream — new-side values for I/U (what the row
    * becomes), old-side values for D (what vanished). Output: the
    * snapshot schema + `op`. Same one-full-outer-shuffle profile as
    * diff.
    */
  def diffFull(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "diffFull needs at least one key column")
    val cols = oldDf.columns.toSeq
    require(newDf.columns.toSeq == cols,
      s"diffFull: schemas differ (old=${cols.mkString(",")} new=${newDf.columns.mkString(",")})")
    val payload = cols.filterNot(keys.contains)
    val o = oldDf.select(cols.map(c => col(c).as(s"__o_$c")): _*)
      .withColumn("__in_old", lit(true))
    val n = newDf.select(cols.map(c => col(c).as(s"__n_$c")): _*)
      .withColumn("__in_new", lit(true))
    val joined = o.join(n,
      keys.map(k => col(s"__o_$k") === col(s"__n_$k")).reduce(_ && _),
      "full_outer")
    val inOld = col("__in_old").isNotNull
    val inNew = col("__in_new").isNotNull
    val anyChange =
      if (payload.isEmpty) lit(false)
      else payload.map(c => !(col(s"__o_$c") <=> col(s"__n_$c"))).reduce(_ || _)
    joined
      .withColumn("op",
        when(inOld && !inNew, lit("D"))
          .when(!inOld && inNew, lit("I"))
          .when(anyChange, lit("U")))
      .filter(col("op").isNotNull)
      .select(cols.map(c =>
        when(col("op") === "D", col(s"__o_$c"))
          .otherwise(col(s"__n_$c")).as(c)) :+ col("op"): _*)
  }

  /** Apply a [[diffFull]]-shaped change feed to a snapshot: delete the
    * D keys, replace the U rows, add the I rows. By construction
    * `applyChanges(old, diffFull(old, new), keys)` reproduces `new`
    * exactly — the round-trip law the spec pins. Apply a feed ONCE:
    * the operation is a transition, not idempotent (re-applying an I
    * duplicates the row).
    *
    * Scale shape: one anti-join on the (small) changed-key set + a
    * union — the snapshot never rewrites rows the feed doesn't touch.
    */
  def applyChanges(snapshot: DataFrame, changes: DataFrame,
                   keys: Seq[String]): DataFrame = {
    require(changes.columns.contains("op"),
      "applyChanges: changes must carry the diffFull op column")
    val removeKeys = changes.filter(col("op").isin("D", "U"))
      .select(keys.map(col): _*).distinct()
    snapshot.join(removeKeys, keys, "left_anti")
      .unionByName(changes.filter(col("op").isin("I", "U")).drop("op"))
  }
}
