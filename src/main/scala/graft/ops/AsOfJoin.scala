package graft.ops

import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.{AsOfJoinNode, GraftStrategy}

/** AS-OF join: for each left row, the latest right row with
  * `rightTs <= leftTs` (backward direction) on the same key — the
  * time-series enrichment operator Spark lacks natively (SURVEY.md §2.4
  * notes it absent from the reference; the builder brief lists it as a
  * canonical custom operator).
  *
  * Spark-first shape (option (a) of the brief's preference order —
  * composition, no custom physical operator needed): tag and union both
  * sides, sort per key by (ts, side), carry the last-seen right payload
  * forward with `last(_, ignoreNulls)` over an unbounded-preceding
  * window, keep left rows. ONE shuffle on the key + a per-key sort —
  * same cost as a sort-merge join, no interval explosion, no skew
  * beyond the key distribution (salt hot keys upstream if needed).
  *
  * Right side must be unique per (key, ts) — pre-aggregate otherwise
  * (ambiguous as-of matches are a data bug, not a tie to break
  * silently).
  */
object AsOfJoin {

  /** Forward direction: the EARLIEST right row with `rightTs >= leftTs`
    * — "next reading at or after". Same union shape with the sort and
    * carry reversed.
    */
  def asofForward(
      left: DataFrame, right: DataFrame,
      key: String, leftTs: String, rightTs: String,
      payloadCols: Seq[String]): DataFrame =
    asof(left, right, key, leftTs, rightTs, payloadCols, forward = true)

  def asofBackward(
      left: DataFrame, right: DataFrame,
      key: String, leftTs: String, rightTs: String,
      payloadCols: Seq[String]): DataFrame =
    asof(left, right, key, leftTs, rightTs, payloadCols, forward = false)

  /** Native-plan form: same semantics as [[asofBackward]]/[[asofForward]]
    * (the spec proves row-for-row parity), executed by the custom
    * [[graft.plans.AsOfJoinExec]] operator instead of the union+window
    * composition. Each side shuffles once on the key and sorts
    * independently — no union frame carrying left-width nulls for every
    * right row, no window state; a per-partition streaming merge with
    * O(1) memory does the matching. Prefer this form when the right
    * side is large (the composition's union row width is
    * left-width+payload for BOTH sides).
    *
    * Installs [[graft.plans.GraftStrategy]] into the session's
    * experimental strategies on first use, so no upfront
    * `spark.sql.extensions` configuration is required.
    */
  def asofNative(
      left: DataFrame, right: DataFrame,
      key: String, leftTs: String, rightTs: String,
      payloadCols: Seq[String], forward: Boolean = false): DataFrame =
    asofNativeKeys(left, right, Seq(key), leftTs, rightTs, payloadCols, forward)

  /** Composite-key form — the exec compares key tuples lexicographically,
    * so any number of equality keys rides the same single-shuffle merge.
    */
  def asofNativeKeys(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      payloadCols: Seq[String], forward: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "asofNative: at least one key")
    val spark = left.sparkSession
    GraftStrategy.install(spark)
    val leftNames = left.columns.toSet
    val clash = payloadCols.filter(leftNames.contains)
    require(clash.isEmpty,
      s"asofNative: payload columns ${clash.mkString(", ")} collide with left columns — alias them first")
    // prune + clean the right side up front (null-ts rows can never
    // match; the exec also guards, but pruning keeps the shuffle lean)
    val rightClean = right.filter(col(rightTs).isNotNull)
      .select((keys ++ (rightTs +: payloadCols.filterNot(c => keys.contains(c) || c == rightTs)))
        .distinct.map(col): _*)
    val lPlan = GraftBridge.analyzed(left)
    val rAnalyzed = GraftBridge.analyzed(rightClean)
    // fresh exprIds on the right so self-as-of (both sides sharing one
    // lineage, as the registered query does) keeps the sides distinct
    val aliases = rAnalyzed.output.map(a => Alias(a, a.name)())
    val rPlan: LogicalPlan = Project(aliases, rAnalyzed)
    val rOut = aliases.map(_.toAttribute)
    def pick(out: Seq[Attribute], n: String, side: String): Attribute =
      out.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"asofNative: column '$n' not found on $side side"))
    val node = AsOfJoinNode(
      lPlan, rPlan,
      leftKeys = keys.map(pick(lPlan.output, _, "left")),
      rightKeys = keys.map(pick(rOut, _, "right")),
      leftTs = pick(lPlan.output, leftTs, "left"),
      rightTs = pick(rOut, rightTs, "right"),
      payload = payloadCols.map(pick(rOut, _, "right")),
      forward = forward)
    GraftBridge.ofRows(spark, node)
  }

  private def asof(
      left: DataFrame, right: DataFrame,
      key: String, leftTs: String, rightTs: String,
      payloadCols: Seq[String], forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    // the payload travels as ONE struct (non-null per right row even
    // when individual fields are null) so the window carry is atomic —
    // carrying columns independently with ignoreNulls would mix fields
    // from different right rows whenever a payload field is null
    val payloadStructR = struct(payloadCols.map(col).toIndexedSeq: _*)
    val payloadType = org.apache.spark.sql.types.StructType(
      payloadCols.map(c => right.schema(c)))
    // right side first at equal timestamps in the scan direction
    // (side=0 sorts before side=1 ascending; window below flips the
    // frame for forward), so an exactly-simultaneous right row IS
    // visible to the left row in both directions
    // a right reading with NO timestamp can never be "as of" anything —
    // drop it up front (otherwise it sorts to an end of the scan and
    // leaks its payload into one direction's carry)
    val rightClean = right.filter(col(rightTs).isNotNull)
    val taggedRight = rightClean.select(
      (col(key).as("__k") +: col(rightTs).as("__ts") +: lit(0).as("__side") +:
        payloadStructR.as("__p") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val taggedLeft = left.select(
      (col(key).as("__k") +: col(leftTs).as("__ts") +: lit(1).as("__side") +:
        lit(null).cast(payloadType).as("__p") +:
        leftCols.map(col)): _*)
    val unioned = taggedRight.unionByName(taggedLeft)
    // nulls FIRST in BOTH scan directions: a left row with no timestamp
    // then precedes every right row and carries a null payload
    // symmetrically (desc's default nulls-last would let it scan after
    // all rights and spuriously match the earliest reading)
    val w =
      if (forward)
        Window.partitionBy(col("__k"))
          .orderBy(col("__ts").desc_nulls_first, col("__side").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      else
        Window.partitionBy(col("__k"))
          .orderBy(col("__ts").asc_nulls_first, col("__side").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__c", last(col("__p"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++ payloadCols.map(c => col(s"__c.`$c`").as(c)): _*)
  }
}
