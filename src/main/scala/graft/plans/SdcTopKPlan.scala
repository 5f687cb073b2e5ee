package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, AttributeReference, GenericInternalRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  BroadcastDistribution, Distribution, IdentityBroadcastMode, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, LongType}

/** Fused probe-join + partial top-k for the SDC pre-rank — the
  * corpus-as-query-batch ANN shape's last shuffle/materialization
  * ceiling (SCALE.md future-work #1). The compositional plan
  *
  *   encodedCorpus ⋈_cell broadcast(probes) → project(ascore)
  *     → [sort + WindowGroupLimit(partial)] → exchange → window rank
  *
  * materializes EVERY candidate row through the join (an UnsafeRow per
  * (query, candidate) pair) and then locally SORTS the whole candidate
  * set so the partial group-limit can stream it — at 100× scale
  * (202k × nProbe probes against ~3k-row cells) that sort+copy was
  * ~116 s of the ProbeBatchProbe wall. This node fuses the three
  * steps: it streams each corpus partition once, scores candidates
  * inline against the broadcast probe side (m table reads each, the
  * identical arithmetic of [[graft.functions.PqSdcScore]] — same adds,
  * same division, bit-identical doubles), and maintains one BOUNDED
  * per-query heap (preRankC entries, the (score DESC, corpus_id ASC)
  * total order of the downstream rank). Non-surviving candidates are
  * never materialized as rows, and nothing is sorted.
  *
  * Output is the per-partition top-preRankC per query — a superset of
  * the global top-preRankC under the SAME total order, so the caller's
  * final window rank over it yields byte-identical shortlists to the
  * compositional plan (spec-pinned; the ANN hash pins ride on this).
  *
  * Memory contract: one heap per DISTINCT query probing a cell present
  * in the partition — ≤ distinctQueries(partition) × preRankC ×16 B.
  * Callers keep that bounded by CLUSTERING the (compact — id, cell,
  * m bytes of codes, norm) corpus side by cell: then a partition holds
  * few cells and only their probing queries (the [[graft.ext.Pq]]
  * store layout gives this for free; the in-memory path pays one
  * compact repartition — see `Pq.sdcPrerankFrom`). Correctness does
  * NOT depend on the clustering: any partitioning yields the same
  * final shortlist, clustering only bounds the heap table.
  *
  * Types are pinned to the index layout (LongType ids/cells,
  * array<int> codes, double norm) — the caller falls back to the
  * compositional plan for exotic id types.
  */
case class SdcPrerankTopKNode(
    corpus: LogicalPlan, // (corpus_id: long, cell: long, codes: array<int>, cnorm: double)
    probes: LogicalPlan, // (query_id: long, qcodes: array<int>, cell: long)
    // resolved ONCE at construction and carried as expression fields
    // (the AsOfJoinNode pattern) so optimizer rewrites of the children
    // (alias removal, pruning) remap them via transformExpressions —
    // name-based lookup in output would break under RemoveRedundantAliases
    corpusId: Attribute, corpusCell: Attribute,
    codes: Attribute, cnorm: Attribute,
    queryId: Attribute, qcodes: Attribute, probeCell: Attribute,
    table: Broadcast[Array[Double]],
    m: Int, ksub: Int, preRankC: Int,
    ascoreAttr: AttributeReference) extends BinaryNode {

  override def left: LogicalPlan = corpus
  override def right: LogicalPlan = probes

  override def output: Seq[Attribute] = Seq(queryId, corpusId, ascoreAttr)

  // ascore is GENERATED here, not read from a child — without this the
  // analyzer counts it as a missing input reference
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(ascoreAttr)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): SdcPrerankTopKNode =
    copy(corpus = newLeft, probes = newRight)
}

/** Per-executor probe-side index: cell → (query_id, qcodes)[], built
  * ONCE per broadcast value per executor instead of once per task —
  * the probe side is corpus-sized in the self-join shape, and 32 tasks
  * each re-hashing 800k rows would dwarf the scoring loop. Weak keys:
  * the entry lives exactly as long as the broadcast block. Soft-ish
  * lifetime is unnecessary — the map strongly references nothing from
  * the rows (codes are copied to primitive arrays).
  */
private[graft] object SdcProbeIndex {
  final class Q(val id: Long, val codes: Array[Int])
  private val cache = new java.util.WeakHashMap[
    AnyRef, java.util.HashMap[java.lang.Long, Array[Q]]]()

  def get(rows: Array[InternalRow], m: Int, qIdIdx: Int, qCodesIdx: Int,
          cellIdx: Int): java.util.HashMap[java.lang.Long, Array[Q]] =
    cache.synchronized {
      val hit = cache.get(rows)
      if (hit != null) hit
      else {
        val tmp = new java.util.HashMap[java.lang.Long, java.util.ArrayList[Q]]()
        var i = 0
        while (i < rows.length) {
          val r = rows(i)
          // null-safe skip mirrors the join (a null key or codes row
          // can never match/score)
          if (!r.isNullAt(qIdIdx) && !r.isNullAt(qCodesIdx) && !r.isNullAt(cellIdx)) {
            val qid = r.getLong(qIdIdx)
            val arr = r.getArray(qCodesIdx)
            val codes = new Array[Int](m)
            var j = 0
            while (j < m) { codes(j) = arr.getInt(j); j += 1 }
            tmp.computeIfAbsent(r.getLong(cellIdx), _ => new java.util.ArrayList[Q]())
              .add(new Q(qid, codes))
          }
          i += 1
        }
        val out = new java.util.HashMap[java.lang.Long, Array[Q]](tmp.size() * 2)
        tmp.forEach((cell, list) => out.put(cell, list.toArray(new Array[Q](0))))
        cache.put(rows, out)
        out
      }
    }
}

/** Bounded worst-at-root binary heap over (score, id) in the
  * (score DESC, id ASC) keep-order: root = the CURRENT WORST kept
  * entry, so an incoming candidate better than the root replaces it in
  * O(log C) and anything not better is dropped in O(1) without ever
  * existing as a row.
  */
private[graft] final class TopKHeap(cap: Int) {
  private val scores = new Array[Double](cap)
  private val ids = new Array[Long](cap)
  var size = 0

  // a is WORSE than b in keep-order (lower score, or same score and higher id)
  @inline private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean =
    sa < sb || (sa == sb && ia > ib)

  def offer(s: Double, id: Long): Unit = {
    if (size < cap) {
      var i = size; scores(i) = s; ids(i) = id; size += 1
      // sift up: parent must be worse-or-equal than child
      while (i > 0) {
        val p = (i - 1) >> 1
        if (worse(scores(i), ids(i), scores(p), ids(p))) {
          val ts = scores(i); val ti = ids(i)
          scores(i) = scores(p); ids(i) = ids(p)
          scores(p) = ts; ids(p) = ti
          i = p
        } else i = -1
      }
    } else if (worse(scores(0), ids(0), s, id)) {
      scores(0) = s; ids(0) = id
      var i = 0
      var continue = true
      while (continue) {
        val l = 2 * i + 1; val r = l + 1
        var w = i
        if (l < size && worse(scores(l), ids(l), scores(w), ids(w))) w = l
        if (r < size && worse(scores(r), ids(r), scores(w), ids(w))) w = r
        if (w == i) continue = false
        else {
          val ts = scores(i); val ti = ids(i)
          scores(i) = scores(w); ids(i) = ids(w)
          scores(w) = ts; ids(w) = ti
          i = w
        }
      }
    }
  }

  def scoreAt(i: Int): Double = scores(i)
  def idAt(i: Int): Long = ids(i)
}

case class SdcPrerankTopKExec(
    corpusId: Attribute, corpusCell: Attribute,
    codes: Attribute, cnorm: Attribute,
    queryId: Attribute, qcodes: Attribute, probeCell: Attribute,
    table: Broadcast[Array[Double]], m: Int, ksub: Int, preRankC: Int,
    ascoreAttr: AttributeReference,
    left: SparkPlan,  // corpus
    right: SparkPlan) // probes
    extends BinaryExecNode {

  private def idx(p: SparkPlan, a: Attribute): Int = {
    val i = p.output.indexWhere(_.exprId == a.exprId)
    require(i >= 0, s"SdcPrerankTopKExec: attribute $a not in ${p.output}")
    i
  }

  override def output: Seq[Attribute] = Seq(queryId, corpusId, ascoreAttr)

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(ascoreAttr)

  // the probe side rides an identity broadcast (EnsureRequirements
  // inserts the BroadcastExchange); the corpus side streams as-is —
  // see the node scaladoc for why clustering is the CALLER's memory
  // lever, not a hard distribution requirement
  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SdcPrerankTopKExec =
    copy(left = newLeft, right = newRight)

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numScoredPairs" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "candidate pairs scored inline"))

  override protected def doExecute(): RDD[InternalRow] = {
    val cidIdx = idx(left, corpusId)
    val cellIdx = idx(left, corpusCell)
    val codesIdx = idx(left, codes)
    val cnormIdx = idx(left, cnorm)
    val qIdIdx = idx(right, queryId)
    val qCodesIdx = idx(right, qcodes)
    val pCellIdx = idx(right, probeCell)
    val mLoc = m; val ksubLoc = ksub; val capLoc = preRankC
    val tableB = table
    val probeRel = right.executeBroadcast[Array[InternalRow]]()
    val outAttrs = output
    val outRows = longMetric("numOutputRows")
    val scored = longMetric("numScoredPairs")

    left.execute().mapPartitions { iter =>
      val t = tableB.value
      val probeIdx = SdcProbeIndex.get(probeRel.value, mLoc,
        qIdIdx, qCodesIdx, pCellIdx)
      val heaps = new java.util.HashMap[java.lang.Long, TopKHeap]()
      val cCodes = new Array[Int](mLoc)
      while (iter.hasNext) {
        val row = iter.next()
        if (!row.isNullAt(cidIdx) && !row.isNullAt(cellIdx) &&
            !row.isNullAt(codesIdx) && !row.isNullAt(cnormIdx)) {
          val qs = probeIdx.get(row.getLong(cellIdx))
          if (qs != null) {
            val cid = row.getLong(cidIdx)
            val cnorm = row.getDouble(cnormIdx)
            val arr = row.getArray(codesIdx)
            var j = 0
            while (j < mLoc) { cCodes(j) = arr.getInt(j); j += 1 }
            var i = 0
            while (i < qs.length) {
              val q = qs(i)
              if (q.id != cid) { // self-exclusion, as the join's filter
                // EXACT PqSdcScore arithmetic: same table layout, same
                // j-ascending adds, one IEEE division — bit-identical
                // to the expression the compositional plan evaluates
                val score =
                  if (cnorm > 0) {
                    var s = 0.0
                    var k = 0
                    while (k < mLoc) {
                      s += t((k * ksubLoc + q.codes(k)) * ksubLoc + cCodes(k))
                      k += 1
                    }
                    s / cnorm
                  } else Double.NegativeInfinity
                scored += 1
                var h = heaps.get(q.id)
                if (h == null) { h = new TopKHeap(capLoc); heaps.put(q.id, h) }
                h.offer(score, cid)
              }
              i += 1
            }
          }
        }
      }
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val entries = heaps.entrySet().iterator()
      new Iterator[InternalRow] {
        private var cur: java.util.Map.Entry[java.lang.Long, TopKHeap] = _
        private var pos = 0
        override def hasNext: Boolean =
          (cur != null && pos < cur.getValue.size) || entries.hasNext
        override def next(): InternalRow = {
          if (cur == null || pos >= cur.getValue.size) {
            cur = entries.next(); pos = 0
          }
          val h = cur.getValue
          val r = new GenericInternalRow(3)
          r.update(0, cur.getKey.longValue())
          r.update(1, h.idAt(pos))
          r.update(2, h.scoreAt(pos))
          pos += 1
          outRows += 1
          proj(r)
        }
      }
    }
  }
}

object SdcTopKPlan {
  /** True when both frames carry the exact physical layout the fused
    * exec is pinned to — the caller's fallback predicate. */
  def layoutSupported(corpus: DataFrame, probes: DataFrame): Boolean = {
    def is(df: DataFrame, n: String, dt: org.apache.spark.sql.types.DataType) =
      df.schema.find(_.name == n).exists(_.dataType == dt)
    val ai = ArrayType(IntegerType, containsNull = false)
    val aiN = ArrayType(IntegerType, containsNull = true)
    def isCodes(df: DataFrame, n: String) = is(df, n, ai) || is(df, n, aiN)
    is(corpus, "corpus_id", LongType) && is(corpus, "cell", LongType) &&
      isCodes(corpus, "codes") && is(corpus, "cnorm", DoubleType) &&
      is(probes, "query_id", LongType) && is(probes, "cell", LongType) &&
      isCodes(probes, "qcodes")
  }

  /** The fused partial top-k as a DataFrame: per corpus partition, the
    * top-`preRankC` (query_id, corpus_id, ascore) per query under
    * (ascore DESC, corpus_id ASC). Finish with the caller's global
    * window rank — its input is now ≤ partitions × preRankC rows per
    * query instead of every candidate.
    */
  def partialTopK(corpus: DataFrame, probes: DataFrame,
                  table: Broadcast[Array[Double]],
                  m: Int, ksub: Int, preRankC: Int): DataFrame = {
    val spark = corpus.sparkSession
    GraftStrategy.install(spark)
    val cPlan = GraftBridge.analyzed(corpus)
    val pPlan = GraftBridge.analyzed(probes)
    def pick(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"partialTopK: no column '$n'"))
    val node = SdcPrerankTopKNode(
      cPlan, pPlan,
      pick(cPlan, "corpus_id"), pick(cPlan, "cell"),
      pick(cPlan, "codes"), pick(cPlan, "cnorm"),
      pick(pPlan, "query_id"), pick(pPlan, "qcodes"), pick(pPlan, "cell"),
      table, m, ksub, preRankC,
      AttributeReference("ascore", DoubleType, nullable = false)())
    GraftBridge.ofRows(spark, node)
  }
}
