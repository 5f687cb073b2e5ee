package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Descending, Expression, JoinedRow, PredicateHelper, SortOrder,
  UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator custom plan for the AS-OF join — the tier-(c) vehicle
  * of the brief's preference order (`LogicalPlan` + `Strategy` +
  * `SparkPlan`), for the one operator where composition pays a real
  * tax: `AsOfJoin.asofBackward` unions both sides into one
  * left-width+payload frame (right rows carry left-width nulls), sorts
  * the union, and runs a window carry. This node instead:
  *
  *   - shuffles each side once on the key (`ClusteredDistribution`, the
  *     same co-partitioning contract as SortMergeJoin — EnsureRequirements
  *     inserts compatible exchanges),
  *   - sorts each side independently by (key, ts) — two smaller sort
  *     runs instead of one over the union, and no widened null columns,
  *   - streams a per-partition merge: one forward pass, O(1) state (the
  *     last matching right row per key), no window buffer.
  *
  * Semantics are EXACTLY `AsOfJoin.asofBackward`/`asofForward` (the
  * spec proves parity row-for-row): for each left row the latest right
  * row with `rightTs <= leftTs` (backward) or the earliest with
  * `rightTs >= leftTs` (forward) on the same key; equal timestamps
  * match; null left ts matches nothing; null right ts never matches;
  * null keys group together (as window `partitionBy` does).
  *
  * Reference anchor: the reference has no as-of operator at all
  * (SURVEY.md §2.4) — this is north-star surface; the logical/physical
  * split mirrors how Spark's own joins are planned.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTs: Attribute,
    rightTs: Attribute,
    payload: Seq[Attribute],
    forward: Boolean) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ payload.map(_.withNullability(true))

  override def maxRows: Option[Long] = left.maxRows

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] as [[AsOfJoinExec]]. Installed either via
  * `spark.sql.extensions=graft.GraftExtensions` or lazily by
  * `AsOfJoin.asofNative` through [[GraftStrategy.install]] (the public
  * `experimental.extraStrategies` hook, so the operator works on any
  * session without upfront configuration).
  */
object GraftStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lts, rts, payload, fwd) =>
      AsOfJoinExec(lk, rk, lts, rts, payload, fwd, planLater(l), planLater(r)) :: Nil
    case ProbeTopKNode(corpus, probes, cid, ccell, cPayload,
        qid, qPayload, pcell, mode, table, m, ksub, cap, partitioned, tau, ascore) =>
      ProbeTopKExec(cid, ccell, cPayload, qid, qPayload, pcell,
        mode, table, m, ksub, cap, partitioned, tau, ascore,
        planLater(corpus), planLater(probes)) :: Nil
    case _ => Nil
  }

  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(GraftStrategy)) {
      spark.experimental.extraStrategies =
        GraftStrategy +: spark.experimental.extraStrategies
    }
    if (!spark.experimental.extraOptimizations.contains(PushFilterThroughAsOfJoin)) {
      spark.experimental.extraOptimizations =
        Seq(PushFilterThroughAsOfJoin, PruneAsOfJoinLeft) ++
          spark.experimental.extraOptimizations
    }
  }
}

/** Optimizer rule — the one pushdown Catalyst can't do for a node it
  * doesn't know: a Filter above [[AsOfJoinNode]] whose conjuncts only
  * reference LEFT columns moves below the node into the left child.
  * Legal because the operator emits exactly one row per left row and a
  * row's match depends only on its OWN key/ts — dropping other left
  * rows can't change it. With the rule, `asofNative(...).filter(left
  * predicate)` reaches the parquet scan as a pushed filter instead of
  * running after the join shuffle. Payload-referencing conjuncts stay
  * above (a right-side filter WOULD change the as-of matches).
  */
object PushFilterThroughAsOfJoin extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case f @ Filter(cond, aj: AsOfJoinNode) =>
      val (pushable, kept) = splitConjunctivePredicates(cond)
        .partition(c => c.deterministic && c.references.subsetOf(aj.left.outputSet))
      if (pushable.isEmpty) f
      else {
        val pushed = aj.copy(left = Filter(pushable.reduce(
          org.apache.spark.sql.catalyst.expressions.And), aj.left))
        kept.reduceOption(org.apache.spark.sql.catalyst.expressions.And)
          .map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Column pruning through the custom node: a Project above
  * [[AsOfJoinNode]] that uses only SOME left columns narrows the left
  * child to (used ∪ keys ∪ ts) — Catalyst's own ColumnPruning skips
  * nodes it doesn't know, so without this a two-column read after an
  * as-of join would still scan the left table's full width.
  */
object PruneAsOfJoinLeft extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case p @ Project(_, aj: AsOfJoinNode) =>
      val needed = p.references ++
        org.apache.spark.sql.catalyst.expressions.AttributeSet(aj.leftKeys :+ aj.leftTs)
      if (aj.left.outputSet.subsetOf(needed)) p
      else {
        // preserve the child's column order for the kept attributes
        val kept = aj.left.output.filter(needed.contains)
        p.copy(child = aj.copy(left = Project(kept, aj.left)))
      }
  }
}

/** Per-partition streaming merge as-of join.
  *
  * Children arrive hash-clustered on the key and sorted by
  * (key ASC, ts ASC) — backward — or (key ASC, ts DESC) — forward — so
  * a single pass suffices: advance the right pointer while its row is
  * "at or before" the current left row in scan order, remembering the
  * last consumed right row of the current key; that row IS the as-of
  * match (latest ≤ ts ascending, earliest ≥ ts descending).
  *
  * State per partition: one buffered right row + one remembered match —
  * O(1) memory regardless of skew (contrast the window composition,
  * whose per-key frame is materialized by the window exec). Row-at-a-time
  * (no codegen), but the merge is a few comparisons per row against
  * already-sorted inputs; the shuffles and sorts dominate at scale.
  */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    payload: Seq[Attribute],
    forward: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payload.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  private def tsDirection = if (forward) Descending else Ascending

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, tsDirection),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTs, tsDirection))

  // one output row per left row, in left order — left's layout survives
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatched" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "left rows with an as-of match"))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val tsType = leftTs.dataType
    val nK = leftKeys.size
    val fwd = forward
    val leftOutput = left.output
    val rightOutput = right.output
    val lProjExprs = leftKeys :+ leftTs
    val rProjExprs = rightKeys ++ (rightTs +: payload)
    val payloadTypes = payload.map(_.dataType)
    val outAttrs = output
    val outRowsMetric = longMetric("numOutputRows")
    val matchedMetric = longMetric("numMatched")

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val keyOrds = keyTypes.map(TypeUtils.getInterpretedOrdering).toArray
      val tsOrd = TypeUtils.getInterpretedOrdering(tsType)
      // both projected layouts lead with the keys, then ts: [k..., ts(, payload...)]
      val lProj = UnsafeProjection.create(lProjExprs, leftOutput)
      val rProj = UnsafeProjection.create(rProjExprs, rightOutput)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joiner = new JoinedRow
      val nullPayload = InternalRow.fromSeq(Seq.fill(payload.length)(null))

      // nulls-first null-safe compare; null key == null key, matching the
      // window composition where partitionBy groups nulls together
      def nullSafe(ord: Ordering[Any], a: Any, b: Any): Int =
        if (a == null && b == null) 0
        else if (a == null) -1
        else if (b == null) 1
        else ord.compare(a, b)

      def keyCmp(a: InternalRow, b: InternalRow): Int = {
        var i = 0
        while (i < nK) {
          val c = nullSafe(
            keyOrds(i).asInstanceOf[Ordering[Any]],
            a.get(i, keyTypes(i)), b.get(i, keyTypes(i)))
          if (c != 0) return c
          i += 1
        }
        0
      }

      new Iterator[InternalRow] {
        // lookahead right row, COPIED (the child iterator reuses its buffer);
        // null-ts right rows can never be "as of" anything — skip on pull
        private var rNext: UnsafeRow = advanceRight()
        private var lastMatch: UnsafeRow = null

        private def advanceRight(): UnsafeRow = {
          while (rIter.hasNext) {
            val r = rProj(rIter.next())
            if (!r.isNullAt(nK)) return r.copy()
          }
          null
        }

        // payload fields of the matched projected right row
        private def payloadOf(m: UnsafeRow): InternalRow = {
          val vals = new Array[Any](payloadTypes.length)
          var i = 0
          while (i < payloadTypes.length) {
            vals(i) = m.get(nK + 1 + i, payloadTypes(i))
            i += 1
          }
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals)
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lkt = lProj(lRow)
          if (lastMatch != null && keyCmp(lastMatch, lkt) != 0) lastMatch = null
          if (lkt.isNullAt(nK)) {
            // unstamped left row: matches nothing (in both directions);
            // the right pointer does not move, so later rows are unaffected
            outRowsMetric += 1
            return resultProj(joiner(lRow, nullPayload))
          }
          val lTsVal = lkt.get(nK, tsType)
          var continue = rNext != null
          while (continue) {
            val kc = keyCmp(rNext, lkt)
            if (kc < 0) {
              // right rows for keys already passed: discard
              rNext = advanceRight()
              continue = rNext != null
            } else if (kc == 0) {
              val tc = tsOrd.asInstanceOf[Ordering[Any]]
                .compare(rNext.get(nK, tsType), lTsVal)
              val atOrBefore = if (fwd) tc >= 0 else tc <= 0
              if (atOrBefore) {
                lastMatch = rNext
                rNext = advanceRight()
                continue = rNext != null
              } else continue = false
            } else continue = false
          }
          outRowsMetric += 1
          if (lastMatch != null) matchedMetric += 1
          val p = if (lastMatch != null) payloadOf(lastMatch) else nullPayload
          resultProj(joiner(lRow, p))
        }
      }
    }
  }
}
