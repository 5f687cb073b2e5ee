package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history — the temporal complement
  * of [[Upsert]]. Where the reference's MERGE loop overwrites dimension
  * rows in place (`ET-ETL-DWH-PY312/ETL/Load.py:63-183`, losing the old
  * attribute values that Q52's changed-dim invalidation then has to
  * reconstruct from fact state), SCD2 keeps every version with a
  * `[valid_from, valid_to)` interval, so point-in-time joins ("which
  * team was this agent on when the call happened") stay answerable.
  *
  * Scale shape: [[merge]] is ONE full-outer join of the open-version
  * slice against the (dim-sized, usually broadcastable) updates batch,
  * followed by narrow ops — the changed-key "close + reopen" double-row
  * is emitted by exploding a compacted 2-element struct array, not by a
  * second join pass. [[fromChangelog]] is two windows over the same
  * (key, ts) partitioning — one shuffle total.
  */
object Scd2 {

  /** Merge an updates batch into an SCD2 table.
    *
    * `current` carries `keys ++ tracked ++ (validFrom, validTo)` with
    * `validTo` null on the open version; `updates` carries
    * `keys ++ tracked ++ effectiveCol`. Per key:
    *   - update for an unknown key → new open version at its effective ts;
    *   - update identical (null-safely) to the open version → no-op,
    *     so replaying a batch is idempotent;
    *   - update differing on any tracked column → the open version
    *     closes at the update's effective ts and a new open version
    *     starts there;
    *   - keys without an update, and all already-closed versions, pass
    *     through untouched.
    *
    * CONTRACT: `updates` must be key-unique (apply
    * [[Upsert.dedupLastWins]] first) and effective timestamps must not
    * precede the open version's `validFrom` (late-arriving dimension
    * rewrites need a history rebuild via [[fromChangelog]], not a merge).
    */
  def merge(current: DataFrame, updates: DataFrame, keys: Seq[String],
            tracked: Seq[String], effectiveCol: String,
            validFrom: String = "valid_from",
            validTo: String = "valid_to"): DataFrame = {
    val outCols = keys ++ tracked :+ validFrom :+ validTo
    val open = current.filter(col(validTo).isNull)
    val closedHist = current.filter(col(validTo).isNotNull)
      .select(outCols.map(col).toIndexedSeq: _*)

    val o = open.select(
      ((keys ++ tracked).map(c => col(c).as(s"o_$c")) :+
        col(validFrom).as("o_vf")).toIndexedSeq: _*)
      .withColumn("__has_o", lit(true))
    val u = updates.select(
      ((keys ++ tracked).map(c => col(c).as(s"u_$c")) :+
        col(effectiveCol).cast("timestamp").as("u_eff")).toIndexedSeq: _*)
      .withColumn("__has_u", lit(true))

    val j = o.join(u, keys.map(k => col(s"o_$k") <=> col(s"u_$k")).reduce(_ && _),
        "full_outer")
      .withColumn("__has_o", coalesce(col("__has_o"), lit(false)))
      .withColumn("__has_u", coalesce(col("__has_u"), lit(false)))
    val differs = tracked.map(c => !(col(s"o_$c") <=> col(s"u_$c"))).reduce(_ || _)

    def version(side: String, vf: Column, vt: Column): Column = struct(
      ((keys ++ tracked).map(c => col(s"${side}_$c").as(c)) :+
        vf.as(validFrom) :+ vt.as(validTo)).toIndexedSeq: _*)

    val nullTs = lit(null).cast("timestamp")
    // existing open version: closes iff a differing update arrived
    val keepOld = version("o", col("o_vf"),
      when(col("__has_u") && differs, col("u_eff")).otherwise(nullTs))
    // new version: for new keys and for differing updates
    val newVer = version("u", col("u_eff"), nullTs)
    val emitted = array(
      when(col("__has_o"), keepOld),
      when(col("__has_u") && (!col("__has_o") || differs), newVer))

    closedHist.unionByName(
      j.select(explode(array_compact(emitted)).as("__v")).select(col("__v.*")))
  }

  /** Rebuild full SCD2 history from a changelog of per-key states (the
    * "I have every snapshot/event, give me intervals" path): collapse
    * consecutive rows whose tracked columns are unchanged, then
    * `valid_from` = the change's ts and `valid_to` = the next change's
    * ts (null while current). `tieBreak` must make (key, ts, tieBreak)
    * unique or interval boundaries are nondeterministic.
    */
  def fromChangelog(changelog: DataFrame, keys: Seq[String],
                    tracked: Seq[String], tsCol: String,
                    tieBreak: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col).toIndexedSeq: _*)
      .orderBy(col(tsCol).asc, col(tieBreak).asc)
    val changed = tracked
      .map(c => !(lag(col(c), 1).over(w) <=> col(c)))
      .reduce(_ || _) || row_number().over(w) === 1
    changelog.withColumn("__chg", changed)
      .filter(col("__chg"))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(
        Window.partitionBy(keys.map(col).toIndexedSeq: _*)
          .orderBy(col(tsCol).asc, col(tieBreak).asc)))
      .select((keys ++ tracked :+ "valid_from" :+ "valid_to").map(col).toIndexedSeq: _*)
  }
}
