package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, AttributeReference, GenericInternalRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  BroadcastDistribution, ClusteredDistribution, Distribution, IdentityBroadcastMode,
  UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.metric.SQLMetric
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, IntegerType, LongType}

/** Fused probe-join + partial top-k — the ANN probe shapes' last
  * shuffle/materialization ceiling (SCALE.md r14 future-work #1). The
  * compositional plan
  *
  *   corpus ⋈_cell broadcast(probes) → project(score)
  *     → [sort + WindowGroupLimit(partial)] → exchange → window rank
  *
  * materializes EVERY candidate row through the join (an UnsafeRow per
  * (query, candidate) pair) and then locally SORTS the whole candidate
  * set so the partial group-limit can stream it — at 100× scale
  * (202k × nProbe probes against ~3k-row cells) that sort+copy
  * dominated the ProbeBatchProbe wall. This node fuses the three
  * steps: it streams each corpus partition once, scores candidates
  * inline against the broadcast probe side, and maintains one BOUNDED
  * per-query heap under the exact (score DESC, corpus_id ASC) total
  * order of the downstream rank (double comparisons via
  * java.lang.Double.compare — the ordering Spark's sort uses, so NaN
  * and signed zeros agree too). Non-surviving candidates are never
  * materialized as rows, and nothing is sorted.
  *
  * Two scoring modes, each replicating its kernel's arithmetic
  * bit-for-bit so results stay byte-identical to the compositional
  * plan (spec-pinned; the ANN hash pins ride on this):
  *   - `sdc`: the symmetric-PQ pre-rank statistic — m reads against
  *     the shared broadcast code-pair table / corpus-side
  *     reconstruction norm ([[graft.functions.PqSdcScore]] adds, one
  *     IEEE division; cnorm ≤ 0 scores −∞). Corpus layout
  *     (corpus_id, cell, codes: array<int>, cnorm), probes
  *     (query_id, qcodes, cell).
  *   - `cos`: the exact float cosine —
  *     dot(q,c) / (√dot(q,q) · √dot(c,c)) with the left-to-right
  *     double accumulation of [[graft.functions.DotProductFloat]];
  *     query norms precompute once per query in the probe index (same
  *     values, same final ops). Corpus layout (corpus_id, cell,
  *     cv: array<float>), probes (query_id, qv, cell). This serves
  *     [[graft.ext.Similarity.ivfTopK]] — the exact-scored workhorse.
  *   - `cospair`: the PAIR-THRESHOLD variant of `cos` for the near-dup
  *     self-join family ([[graft.ext.Dedup.embeddingNearDupsBucketed]]):
  *     no heaps — every (query, candidate) with query_id < corpus_id
  *     and cosine ≥ `tau` is emitted as it is scored (NaN ≥ τ mirrors
  *     Spark, where NaN compares larger than any value). Replaces the
  *     within-cell self-join whose output was an UnsafeRow carrying
  *     TWO full vectors per CANDIDATE pair (~hundreds of GB at 10⁸
  *     pairs) with inline scoring that materializes only survivors.
  *     The caller still dedups pairs probed in two shared cells.
  *   - `cospairu`: the UNORDERED pair-threshold variant for the
  *     incremental batch-vs-store shape
  *     ([[graft.ext.Dedup.embeddingNearDupsAgainst]]): the two sides
  *     are DISJOINT row sets (an incoming batch probed against a
  *     persisted store), so there is no `a.id < b.id` conjunct and no
  *     self-exclusion — every (query, candidate) pair with cosine ≥
  *     `tau` is emitted, exactly the compositional batch×store
  *     equi-join's semantics (ids that happen to collide across the
  *     two sides pair like any other rows, as they do in the join).
  *
  * Output is the per-partition top-`cap` per query — a superset of the
  * global top-cap under the SAME total order, so the caller's final
  * window rank over it yields byte-identical results. Rows with a null
  * id/cell/payload are skipped (they cannot join/score in the
  * compositional plan either; vectors/codes are non-null by
  * construction in every caller).
  *
  * Memory contract: one heap per DISTINCT query probing a cell present
  * in the partition — ≤ distinctQueries(partition) × cap entries. For
  * generous caps (the SDC pre-rank's preRankC) callers bound it by
  * CLUSTERING the compact corpus side by cell (the store layout gives
  * this for free; the in-memory path pays one compact repartition).
  * For top-k caps (ivfTopK's k ≈ 5–10) the table is small under any
  * partitioning. Correctness never depends on the clustering.
  *
  * TWO execution modes, selected by probe-side size (the BHJ→SMJ
  * escalation pattern, threshold `spark.graft.ann.probeBroadcastThreshold`):
  *   - `partitioned = false`: the probe side rides an identity
  *     broadcast; the corpus streams in place with NO shuffle. Right
  *     for query batches up to ~10⁷ rows (the per-executor index is
  *     tens–hundreds of MB).
  *   - `partitioned = true`: BOTH sides hash-cluster on `cell`
  *     (ClusteredDistribution ×2, the SortMergeJoin co-partitioning
  *     contract) and each partition builds a probe index over only ITS
  *     cells — per-executor memory drops from O(all probes) to
  *     O(probes in local cells), the escape hatch for corpus-sized
  *     probe sides (the self-join near-dup shape at 10⁸–10⁹ rows),
  *     at the cost of shuffling both sides once. Output rows differ
  *     per partition between the modes, but both are supersets of the
  *     global top-cap under the SAME total order — any partitioning of
  *     the scored-pair set is (each global winner beats even fewer
  *     rivals inside its own partition) — so the caller's final window
  *     rank is byte-identical either way (spec-pinned).
  *
  * Types are pinned to the index layout (LongType ids/cells) — callers
  * fall back to the compositional plan for exotic id types.
  */
case class ProbeTopKNode(
    corpus: LogicalPlan,
    probes: LogicalPlan,
    // resolved ONCE at construction and carried as expression fields
    // (the AsOfJoinNode pattern) so optimizer rewrites of the children
    // (alias removal, pruning) remap them via transformExpressions —
    // name-based lookup in output would break under RemoveRedundantAliases
    corpusId: Attribute, corpusCell: Attribute,
    corpusPayload: Seq[Attribute], // sdc: (codes, cnorm); cos: (cv)
    queryId: Attribute,
    queryPayload: Attribute,       // sdc: qcodes; cos: qv
    probeCell: Attribute,
    mode: String,                  // "sdc" | "cos" | "cospair"
    table: Option[Broadcast[Array[Double]]], // sdc only
    m: Int, ksub: Int, cap: Int,
    partitioned: Boolean,          // cell-co-partitioned vs probe broadcast
    tau: Double,                   // cospair only: emission threshold
    ascoreAttr: AttributeReference) extends BinaryNode {

  require(mode == "sdc" || mode == "cos" || mode == "cospair" ||
    mode == "cospairu",
    s"ProbeTopKNode: bad mode '$mode'")

  override def left: LogicalPlan = corpus
  override def right: LogicalPlan = probes

  override def output: Seq[Attribute] = Seq(queryId, corpusId, ascoreAttr)

  // ascore is GENERATED here, not read from a child — without this the
  // analyzer counts it as a missing input reference
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(ascoreAttr)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): ProbeTopKNode =
    copy(corpus = newLeft, probes = newRight)
}

/** Per-executor probe-side index: cell → query entries, built ONCE per
  * broadcast value per executor instead of once per task — the probe
  * side is corpus-sized in the self-join shape, and 32 tasks each
  * re-hashing 800k rows would dwarf the scoring loop. Weak keys: the
  * entry lives exactly as long as the broadcast block; the built maps
  * reference nothing from the rows (payloads are copied to primitive
  * arrays).
  */
private[graft] object ProbeIndex {
  final class QCodes(val id: Long, val codes: Array[Int])
  final class QVec(val id: Long, val vec: Array[Float], val norm: Double)

  // outer key: broadcast rows array IDENTITY (weak — entry lives as long
  // as the broadcast block); inner key: the column layout baked into the
  // built index. Without the inner key, ReuseExchange feeding ONE
  // broadcast to two fused execs with different column positions (or m)
  // would silently reuse a stale index (ADVICE r15).
  private val codesCache = new java.util.WeakHashMap[
    AnyRef, java.util.HashMap[String, java.util.HashMap[java.lang.Long, Array[QCodes]]]]()
  private val vecCache = new java.util.WeakHashMap[
    AnyRef, java.util.HashMap[String, java.util.HashMap[java.lang.Long, Array[QVec]]]]()

  /** Build a cell → probe-codes index from a row stream — reads every
    * needed field into primitives before advancing, so the iterator's
    * row buffer reuse is safe. The partitioned mode calls this directly
    * (one index per partition, no caching wanted).
    */
  def buildCodes(rows: Iterator[InternalRow], m: Int, qIdIdx: Int, qPayIdx: Int,
                 cellIdx: Int): java.util.HashMap[java.lang.Long, Array[QCodes]] = {
    val tmp = new java.util.HashMap[java.lang.Long, java.util.ArrayList[QCodes]]()
    while (rows.hasNext) {
      val r = rows.next()
      if (!r.isNullAt(qIdIdx) && !r.isNullAt(qPayIdx) && !r.isNullAt(cellIdx)) {
        val arr = r.getArray(qPayIdx)
        val cs = new Array[Int](m)
        var j = 0
        while (j < m) { cs(j) = arr.getInt(j); j += 1 }
        tmp.computeIfAbsent(r.getLong(cellIdx), _ => new java.util.ArrayList[QCodes]())
          .add(new QCodes(r.getLong(qIdIdx), cs))
      }
    }
    val out = new java.util.HashMap[java.lang.Long, Array[QCodes]](tmp.size() * 2)
    tmp.forEach((cell, list) => out.put(cell, list.toArray(new Array[QCodes](0))))
    out
  }

  /** Build a cell → probe-vector index (with precomputed ‖q‖ — same
    * left-to-right double accumulation as DotProductFloat, same sqrt,
    * the value the compositional normF(qv) computes per CANDIDATE).
    */
  def buildVecs(rows: Iterator[InternalRow], qIdIdx: Int, qPayIdx: Int,
                cellIdx: Int): java.util.HashMap[java.lang.Long, Array[QVec]] = {
    val tmp = new java.util.HashMap[java.lang.Long, java.util.ArrayList[QVec]]()
    while (rows.hasNext) {
      val r = rows.next()
      if (!r.isNullAt(qIdIdx) && !r.isNullAt(qPayIdx) && !r.isNullAt(cellIdx)) {
        val arr = r.getArray(qPayIdx)
        val n = arr.numElements()
        val v = new Array[Float](n)
        var j = 0
        while (j < n) { v(j) = arr.getFloat(j); j += 1 }
        var qq = 0.0
        j = 0
        while (j < n) { qq += v(j).toDouble * v(j).toDouble; j += 1 }
        tmp.computeIfAbsent(r.getLong(cellIdx), _ => new java.util.ArrayList[QVec]())
          .add(new QVec(r.getLong(qIdIdx), v, math.sqrt(qq)))
      }
    }
    val out = new java.util.HashMap[java.lang.Long, Array[QVec]](tmp.size() * 2)
    tmp.forEach((cell, list) => out.put(cell, list.toArray(new Array[QVec](0))))
    out
  }

  def codes(rows: Array[InternalRow], m: Int, qIdIdx: Int, qPayIdx: Int,
            cellIdx: Int): java.util.HashMap[java.lang.Long, Array[QCodes]] =
    codesCache.synchronized {
      val byLayout = codesCache.computeIfAbsent(rows,
        _ => new java.util.HashMap[String, java.util.HashMap[java.lang.Long, Array[QCodes]]]())
      val layoutKey = s"$m:$qIdIdx:$qPayIdx:$cellIdx"
      val hit = byLayout.get(layoutKey)
      if (hit != null) hit
      else {
        val out = buildCodes(rows.iterator, m, qIdIdx, qPayIdx, cellIdx)
        byLayout.put(layoutKey, out)
        out
      }
    }

  def vecs(rows: Array[InternalRow], qIdIdx: Int, qPayIdx: Int,
           cellIdx: Int): java.util.HashMap[java.lang.Long, Array[QVec]] =
    vecCache.synchronized {
      val byLayout = vecCache.computeIfAbsent(rows,
        _ => new java.util.HashMap[String, java.util.HashMap[java.lang.Long, Array[QVec]]]())
      val layoutKey = s"$qIdIdx:$qPayIdx:$cellIdx"
      val hit = byLayout.get(layoutKey)
      if (hit != null) hit
      else {
        val out = buildVecs(rows.iterator, qIdIdx, qPayIdx, cellIdx)
        byLayout.put(layoutKey, out)
        out
      }
    }
}

/** Bounded worst-at-root binary heap over (score, id) in the
  * (score DESC, id ASC) keep-order: root = the CURRENT WORST kept
  * entry, so an incoming candidate better than the root replaces it in
  * O(log C) and anything not better is dropped in O(1) without ever
  * existing as a row. Score comparisons use java.lang.Double.compare —
  * the total order Spark's own double sort uses (NaN largest, -0 < 0) —
  * so the kept set exactly matches the downstream window rank.
  */
private[graft] final class TopKHeap(cap: Int) {
  private val scores = new Array[Double](cap)
  private val ids = new Array[Long](cap)
  var size = 0

  // a is WORSE than b in keep-order (lower score, or same score and higher id)
  @inline private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean = {
    val c = java.lang.Double.compare(sa, sb)
    c < 0 || (c == 0 && ia > ib)
  }

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

case class ProbeTopKExec(
    corpusId: Attribute, corpusCell: Attribute,
    corpusPayload: Seq[Attribute],
    queryId: Attribute, queryPayload: Attribute, probeCell: Attribute,
    mode: String, table: Option[Broadcast[Array[Double]]],
    m: Int, ksub: Int, cap: Int,
    partitioned: Boolean,
    tau: Double,
    ascoreAttr: AttributeReference,
    left: SparkPlan,  // corpus
    right: SparkPlan) // probes
    extends BinaryExecNode {

  private def idx(p: SparkPlan, a: Attribute): Int = {
    val i = p.output.indexWhere(_.exprId == a.exprId)
    require(i >= 0, s"ProbeTopKExec: attribute $a not in ${p.output}")
    i
  }

  override def output: Seq[Attribute] = Seq(queryId, corpusId, ascoreAttr)

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(ascoreAttr)

  // broadcast mode: the probe side rides an identity broadcast
  // (EnsureRequirements inserts the BroadcastExchange) and the corpus
  // streams as-is. Partitioned mode: both sides hash-cluster on cell —
  // the same two-ClusteredDistribution co-partitioning contract
  // AsOfJoinExec (and SortMergeJoin) use, so EnsureRequirements gives
  // zipPartitions-compatible children.
  override def requiredChildDistribution: Seq[Distribution] =
    if (partitioned)
      ClusteredDistribution(Seq(corpusCell)) ::
        ClusteredDistribution(Seq(probeCell)) :: Nil
    else
      UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): ProbeTopKExec =
    copy(left = newLeft, right = newRight)

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numScoredPairs" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "candidate pairs scored inline"))

  override protected def doExecute(): RDD[InternalRow] = {
    val cidIdx = idx(left, corpusId)
    val cellIdx = idx(left, corpusCell)
    val payIdx = corpusPayload.map(idx(left, _))
    val qIdIdx = idx(right, queryId)
    val qPayIdx = idx(right, queryPayload)
    val pCellIdx = idx(right, probeCell)
    val mLoc = m; val ksubLoc = ksub; val capLoc = cap
    val isSdc = mode == "sdc"
    val tableB = table.orNull
    val outAttrs = output
    val outRows = longMetric("numOutputRows")
    val scored = longMetric("numScoredPairs")

    val isPair = mode == "cospair" || mode == "cospairu"
    val orderedPair = mode == "cospair"
    val tauLoc = tau

    if (partitioned) {
      // both children arrive hash-clustered on cell with matching
      // partition counts (EnsureRequirements) — each partition builds a
      // probe index over only ITS cells; no broadcast exists anywhere
      left.execute().zipPartitions(right.execute()) { (cIter, pIter) =>
        if (isSdc) {
          val probeIdx = ProbeIndex.buildCodes(pIter, mLoc, qIdIdx, qPayIdx, pCellIdx)
          ProbeScorer.sdc(cIter, probeIdx, tableB.value,
            cidIdx, cellIdx, payIdx(0), payIdx(1), mLoc, ksubLoc, capLoc,
            outAttrs, outRows, scored)
        } else {
          val probeIdx = ProbeIndex.buildVecs(pIter, qIdIdx, qPayIdx, pCellIdx)
          if (isPair)
            ProbeScorer.cosPairs(cIter, probeIdx,
              cidIdx, cellIdx, payIdx(0), tauLoc, orderedPair,
              outAttrs, outRows, scored)
          else
            ProbeScorer.cos(cIter, probeIdx,
              cidIdx, cellIdx, payIdx(0), capLoc, outAttrs, outRows, scored)
        }
      }
    } else {
      val probeRel = right.executeBroadcast[Array[InternalRow]]()
      left.execute().mapPartitions { iter =>
        if (isSdc) {
          val probeIdx = ProbeIndex.codes(probeRel.value, mLoc, qIdIdx, qPayIdx, pCellIdx)
          ProbeScorer.sdc(iter, probeIdx, tableB.value,
            cidIdx, cellIdx, payIdx(0), payIdx(1), mLoc, ksubLoc, capLoc,
            outAttrs, outRows, scored)
        } else {
          val probeIdx = ProbeIndex.vecs(probeRel.value, qIdIdx, qPayIdx, pCellIdx)
          if (isPair)
            ProbeScorer.cosPairs(iter, probeIdx,
              cidIdx, cellIdx, payIdx(0), tauLoc, orderedPair,
              outAttrs, outRows, scored)
          else
            ProbeScorer.cos(iter, probeIdx,
              cidIdx, cellIdx, payIdx(0), capLoc, outAttrs, outRows, scored)
        }
      }
    }
  }
}

/** The per-partition scoring loops, shared verbatim by the broadcast
  * and partitioned execution modes — one code path means the modes
  * cannot drift arithmetically (the byte-equivalence pin compares them
  * directly). Stateless object: closures capture only primitives,
  * metrics, and the prebuilt probe index.
  */
private[graft] object ProbeScorer {
  import ProbeIndex.{QCodes, QVec}

  private def heapFor(heaps: java.util.HashMap[java.lang.Long, TopKHeap],
                      qid: Long, cap: Int): TopKHeap = {
    var h = heaps.get(qid)
    if (h == null) { h = new TopKHeap(cap); heaps.put(qid, h) }
    h
  }

  /** A zero-norm vector makes the cosine denominator 0 — the
    * compositional plan's `Divide` raises DIVIDE_BY_ZERO there under
    * ANSI mode (the Spark 4 default every shipped session runs). Raise
    * the same loud error instead of silently scoring NaN/∞: a
    * zero-norm embedding in a similarity scan is corrupt input, and at
    * 100 TB a silent NaN pair is unfindable. The raise matches the
    * compositional plan ONLY under ANSI, so the cosine modes hard-
    * require ANSI at build time and [[SdcTopKPlan.cosineLayoutSupported]]
    * reports false for non-ANSI sessions (callers then keep the
    * compositional plan, whose Divide carries the session's own
    * semantics — NULL-drop when ANSI is off).
    */
  @inline private def checkedDenom(denom: Double, qid: Long, cid: Long): Double = {
    if (denom == 0.0)
      throw new ArithmeticException(
        s"cosine division by zero: zero-norm vector in pair (query_id=$qid, " +
          s"corpus_id=$cid) — the compositional Divide raises here too (ANSI)")
    denom
  }

  def sdc(iter: Iterator[InternalRow],
          probeIdx: java.util.HashMap[java.lang.Long, Array[QCodes]],
          t: Array[Double],
          cidIdx: Int, cellIdx: Int, codesIdx: Int, cnormIdx: Int,
          m: Int, ksub: Int, cap: Int,
          outAttrs: Seq[Attribute],
          outRows: SQLMetric, scored: SQLMetric): Iterator[InternalRow] = {
    val heaps = new java.util.HashMap[java.lang.Long, TopKHeap]()
    val cCodes = new Array[Int](m)
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
          while (j < m) { cCodes(j) = arr.getInt(j); j += 1 }
          var i = 0
          while (i < qs.length) {
            val q = qs(i)
            if (q.id != cid) { // self-exclusion, as the join's filter
              // EXACT PqSdcScore arithmetic: same table layout, same
              // j-ascending adds, one IEEE division. NaN guard: Spark's
              // `when(cnorm > 0, ...)` treats NaN as larger than any
              // value (NaN cnorm → condition true → s/NaN = NaN score,
              // ranking FIRST desc); Java's primitive `>` is false for
              // NaN — mirror Spark so a corrupt cnorm can't silently
              // break the byte-identical pin (unreachable for
              // well-formed indexes: cnorm = sqrt of a self-score)
              val score =
                if (cnorm > 0 || java.lang.Double.isNaN(cnorm)) {
                  var s = 0.0
                  var k = 0
                  while (k < m) {
                    s += t((k * ksub + q.codes(k)) * ksub + cCodes(k))
                    k += 1
                  }
                  s / cnorm
                } else Double.NegativeInfinity
              scored += 1
              heapFor(heaps, q.id, cap).offer(score, cid)
            }
            i += 1
          }
        }
      }
    }
    emit(heaps, outAttrs, outRows)
  }

  def cos(iter: Iterator[InternalRow],
          probeIdx: java.util.HashMap[java.lang.Long, Array[QVec]],
          cidIdx: Int, cellIdx: Int, cvIdx: Int, cap: Int,
          outAttrs: Seq[Attribute],
          outRows: SQLMetric, scored: SQLMetric): Iterator[InternalRow] = {
    val heaps = new java.util.HashMap[java.lang.Long, TopKHeap]()
    var cv: Array[Float] = null
    while (iter.hasNext) {
      val row = iter.next()
      if (!row.isNullAt(cidIdx) && !row.isNullAt(cellIdx) &&
          !row.isNullAt(cvIdx)) {
        val qs = probeIdx.get(row.getLong(cellIdx))
        if (qs != null) {
          val cid = row.getLong(cidIdx)
          val arr = row.getArray(cvIdx)
          val n = arr.numElements()
          if (cv == null || cv.length != n) cv = new Array[Float](n)
          var j = 0
          while (j < n) { cv(j) = arr.getFloat(j); j += 1 }
          // ‖c‖ once per corpus row — same accumulation as normF(cv)
          var cc = 0.0
          j = 0
          while (j < n) { cc += cv(j).toDouble * cv(j).toDouble; j += 1 }
          val nc = math.sqrt(cc)
          var i = 0
          while (i < qs.length) {
            val q = qs(i)
            if (q.id != cid) {
              // EXACT cosineF arithmetic: dot(q,c) / (‖q‖ * ‖c‖),
              // left-to-right double accumulation (DotProductFloat)
              require(q.vec.length == n,
                s"dot_product_float: mismatched dimensions (${q.vec.length} vs $n)")
              var d = 0.0
              var k = 0
              while (k < n) { d += q.vec(k).toDouble * cv(k).toDouble; k += 1 }
              scored += 1
              heapFor(heaps, q.id, cap).offer(d / checkedDenom(q.norm * nc, q.id, cid), cid)
            }
            i += 1
          }
        }
      }
    }
    emit(heaps, outAttrs, outRows)
  }

  /** Pair-threshold mode: emit (query_id, corpus_id, cos) for every
    * scored pair with query_id < corpus_id and cosine ≥ tau — no heap,
    * survivors stream out as they are found. Replicates the
    * compositional self-join's semantics exactly: the `a.id < b.id`
    * join conjunct becomes the q.id < cid guard (each unordered pair
    * scores once per SHARED cell — the caller's dropDuplicates keeps
    * one), and the `cos >= τ` filter keeps NaN because Spark compares
    * NaN larger than any value. NaN survival is reachable only through
    * NaN INPUT components: a zero-norm pair RAISES in [[checkedDenom]],
    * exactly as the compositional Divide does under ANSI mode (the
    * build-time requirement — non-ANSI sessions route to the
    * compositional fallback instead).
    */
  def cosPairs(iter: Iterator[InternalRow],
               probeIdx: java.util.HashMap[java.lang.Long, Array[QVec]],
               cidIdx: Int, cellIdx: Int, cvIdx: Int, tau: Double,
               ordered: Boolean,
               outAttrs: Seq[Attribute],
               outRows: SQLMetric, scored: SQLMetric): Iterator[InternalRow] = {
    val proj = UnsafeProjection.create(outAttrs, outAttrs)
    var cv: Array[Float] = null
    iter.flatMap { row =>
      if (row.isNullAt(cidIdx) || row.isNullAt(cellIdx) || row.isNullAt(cvIdx))
        Iterator.empty
      else {
        val qs = probeIdx.get(row.getLong(cellIdx))
        if (qs == null) Iterator.empty
        else {
          val cid = row.getLong(cidIdx)
          val arr = row.getArray(cvIdx)
          val n = arr.numElements()
          if (cv == null || cv.length != n) cv = new Array[Float](n)
          var j = 0
          while (j < n) { cv(j) = arr.getFloat(j); j += 1 }
          var cc = 0.0
          j = 0
          while (j < n) { cc += cv(j).toDouble * cv(j).toDouble; j += 1 }
          val nc = math.sqrt(cc)
          // survivors only — bounded by probes-in-cell that pass τ,
          // tiny at near-dup thresholds
          val hits = new scala.collection.mutable.ArrayBuffer[(Long, Double)]()
          var i = 0
          while (i < qs.length) {
            val q = qs(i)
            // ordered: the self-join's a.id < b.id conjunct; unordered
            // (batch-vs-store): every pair scores, no self-exclusion —
            // the sides are disjoint row sets and the compositional
            // equi-join has no id conjunct either
            if (!ordered || q.id < cid) {
              require(q.vec.length == n,
                s"dot_product_float: mismatched dimensions (${q.vec.length} vs $n)")
              var d = 0.0
              var k = 0
              while (k < n) { d += q.vec(k).toDouble * cv(k).toDouble; k += 1 }
              val s = d / checkedDenom(q.norm * nc, q.id, cid)
              scored += 1
              // NaN ≥ τ mirrors Spark, where NaN compares larger than
              // any value (reachable only via NaN INPUT components —
              // zero norms raise above, as the compositional Divide
              // does under ANSI)
              if (s >= tau || java.lang.Double.isNaN(s)) hits += ((q.id, s))
            }
            i += 1
          }
          hits.iterator.map { case (qid, s) =>
            val r = new GenericInternalRow(3)
            r.update(0, qid)
            r.update(1, cid)
            r.update(2, s)
            outRows += 1
            proj(r)
          }
        }
      }
    }
  }

  private def emit(heaps: java.util.HashMap[java.lang.Long, TopKHeap],
                   outAttrs: Seq[Attribute],
                   outRows: SQLMetric): Iterator[InternalRow] = {
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

object SdcTopKPlan {
  private def is(df: DataFrame, n: String,
                 dt: org.apache.spark.sql.types.DataType): Boolean =
    df.schema.find(_.name == n).exists(_.dataType == dt)
  private def isArr(df: DataFrame, n: String,
                    el: org.apache.spark.sql.types.DataType): Boolean =
    is(df, n, ArrayType(el, containsNull = false)) ||
      is(df, n, ArrayType(el, containsNull = true))

  /** True when both frames carry the exact physical layout the fused
    * SDC exec is pinned to — the caller's fallback predicate. */
  def layoutSupported(corpus: DataFrame, probes: DataFrame): Boolean =
    is(corpus, "corpus_id", LongType) && is(corpus, "cell", LongType) &&
      isArr(corpus, "codes", IntegerType) && is(corpus, "cnorm", DoubleType) &&
      is(probes, "query_id", LongType) && is(probes, "cell", LongType) &&
      isArr(probes, "qcodes", IntegerType)

  /** True when both frames carry the cosine-mode layout AND the session
    * runs ANSI mode. The fused cosine scorers replicate the
    * compositional `Divide`'s ANSI raise on a zero-norm denominator;
    * with ANSI off the compositional plan NULL-drops that pair instead,
    * so a non-ANSI session must keep the compositional plan to keep its
    * own semantics (ADVICE r16). Every shipped session runs ANSI (the
    * Spark 4 default) — this only reroutes sessions that explicitly
    * turned it off.
    */
  def cosineLayoutSupported(corpus: DataFrame, probes: DataFrame): Boolean =
    corpus.sparkSession.sessionState.conf.ansiEnabled &&
      is(corpus, "corpus_id", LongType) && is(corpus, "cell", LongType) &&
      isArr(corpus, "cv", FloatType) &&
      is(probes, "query_id", LongType) && is(probes, "cell", LongType) &&
      isArr(probes, "qv", FloatType)

  /** Probe-side bytes above which the operator escalates from the
    * identity-broadcast mode to the cell-co-partitioned mode (the
    * BHJ→SMJ pattern; `-1` disables broadcast entirely — every plan
    * goes partitioned, the spec's forcing lever). Default 512 MB: the
    * identity broadcast materializes the whole probe side on the
    * driver and once per executor, so the r15 soak shapes (≤ 202 k
    * probes ≈ tens of MB) stay broadcast, while a corpus-sized probe
    * side (10⁸–10⁹ rows in the self-join near-dup shape) trips to
    * partitioned instead of OOMing every executor.
    */
  val probeBroadcastThresholdKey = "spark.graft.ann.probeBroadcastThreshold"
  private val defaultProbeBroadcastThreshold: Long = 512L << 20

  /** Skew hardening for the PARTITIONED mode (r16 verdict #1): both
    * sides hash-cluster on `cell`, so a hot cell — a collapsed/dead
    * centroid — lands on ONE task and serializes the stage, and AQE
    * skew-split cannot rebalance a custom exec. When
    * `spark.graft.ann.skewSaltFactor` = S > 1, cells holding more than
    * `spark.graft.ann.skewCellFraction` of the corpus (default 5%) are
    * sub-split: the BUILDER rewrites both sides' cell column to the
    * composite `cell·S + salt` — corpus rows of a hot cell take
    * salt = hash(corpus_id) mod S (each row exactly one sub-cell),
    * probe rows of a hot cell REPLICATE across all S sub-cells, cold
    * cells map to salt 0. Matching is exact on the composite key, so
    * every (probe, corpus) pair that shared a cell shares exactly one
    * sub-cell: the scored-pair SET is unchanged, only its partitioning
    * — and any partitioning of the scored pairs yields the same global
    * result (the superset property the two execution modes already
    * rely on; spec-pinned byte-identical).
    *
    * ON BY DEFAULT where detection is free (r17 verdict #1): when the
    * builder hands over [[CellStats]] — per-cell counts the index
    * build's own refinement aggregation already produced
    * ([[graft.ext.Similarity.refineCentroidsWithStats]]) — detection is
    * a driver-side scan of ≤ nCells collected longs, so with the conf
    * UNSET the operator auto-salts from those stats. Every shipped
    * caller (the Dedup near-dup family, ivfTopK) threads stats, so a
    * degenerate/untrusted centroid set no longer hits the measured
    * 20–50× serialization wall silently. With the conf unset and NO
    * stats available (direct operator use), detection stays off — the
    * old default — because it would cost one extra aggregation pass
    * over the corpus lineage per build.
    *
    * Explicit settings override: `auto` forces detection even without
    * stats (pays the lineage pass — the r17 opt-in form); an integer
    * S > 1 salts hot cells ×S (detection from stats when present, the
    * lineage pass otherwise); `off`/`0`/`1` disables entirely.
    *
    * Hot-cell rule: the auto/default path requires BOTH the absolute
    * fraction and the pair-work criterion ([[detectHotCellsAuto]] —
    * what makes default-on safe on balanced small-nCells layouts);
    * the explicit fixed-S mode keeps the r17 fraction-only rule
    * ([[detectHotCells]]).
    *
    * Detection residuals (ADVICE r17, perf-only — salting is
    * output-invariant for ANY hot set, spec-pinned): (a) stats come
    * from the LAST refinement iteration's aggregation, one Lloyd step
    * stale relative to the final assignment — a collapsed cell is
    * stable across one step, a cell crossing the threshold on the last
    * step can be missed; (b) both stats and the lineage pass count the
    * CORPUS side only — a probe-side-only hot cell (many probe rows,
    * balanced corpus) is not detected, though when any corpus-hot cell
    * triggers salting the sub-split parallelizes that cell's pair work
    * regardless of which side contributed the mass.
    */
  val skewSaltFactorKey = "spark.graft.ann.skewSaltFactor"
  val skewCellFractionKey = "spark.graft.ann.skewCellFraction"

  /** Per-cell assignment counts captured for free from an aggregation
    * pass the index build already ran (the Lloyd refinement's per-cell
    * mean — [[graft.ext.Similarity.refineCentroidsWithStats]]).
    * `counts` is bounded by nCells rows (collected with the centroids,
    * which are driver-materialized by contract). CONTRACT: `counts`
    * must enumerate every cell id the operator's inputs can carry —
    * the composite-key overflow guard takes its id range from these
    * keys. Internal builders satisfy this by construction: assignment
    * only emits ids of centroids that survived refinement, which are
    * exactly the ids the refinement aggregation counted. */
  final case class CellStats(counts: Seq[(Long, Long)], total: Long) {
    def minCell: Long = counts.iterator.map(_._1).min
    def maxCell: Long = counts.iterator.map(_._1).max
  }

  /** Which detection source the conf + available stats select: "none"
    * (no detection), "stats" (free — provided [[CellStats]]), "pass"
    * (one aggregation pass over the corpus lineage). Pure —
    * unit-testable. `confOpt` = the raw conf value, None when unset. */
  private[graft] def detectionSource(confOpt: Option[String],
                                     statsPresent: Boolean): String =
    confOpt.map(_.trim) match {
      case None => if (statsPresent) "stats" else "none"
      case Some(c) if c.equalsIgnoreCase("auto") =>
        if (statsPresent) "stats" else "pass"
      case Some(c) if c.equalsIgnoreCase("off") => "none"
      case Some(c) =>
        if (c.toInt <= 1) "none"
        else if (statsPresent) "stats" else "pass"
    }

  /** Last salt decision taken by [[maybeSaltCells]] — test/probe
    * observability only (the decision is otherwise visible only as a
    * stderr line and a rewritten cell column). */
  @volatile private[graft] var lastSaltDecision: String = "unsalted"

  /** Hot cells from collected (cell, rows) stats: cells holding
    * ≥ `frac` of `total` rows. Pure — unit-testable. This is the
    * FIXED-S mode's rule (explicit integer conf, r17 semantics); the
    * auto/default path layers the pair-work criterion on top
    * ([[detectHotCellsAuto]]). */
  private[graft] def detectHotCells(counts: Seq[(Long, Long)], total: Long,
                                    frac: Double): Seq[Long] =
    counts.filter { case (_, n) => n.toDouble >= frac * total }.map(_._1)

  /** Hot cells for the AUTO/default path: a cell must hold ≥ `frac` of
    * the corpus AND its pair WORK (n², the within-cell candidate count
    * the partitioned mode serializes on one task) must exceed
    * `HotWorkFactor` × the fair per-task share of total pair work
    * (Σn²/parallelism). The second criterion is what makes default-on
    * detection safe: at small nCells a BALANCED layout puts every cell
    * above an absolute fraction (16 cells ⇒ 6.25 % each > the 5 %
    * default), but balanced cells carry ≤ parallelism/nCells × the
    * fair work share — being at the mean is balance, not skew.
    * `sumSq` = Σn² over ALL cells (not just the candidates). Pure —
    * unit-testable. Known residual (documented): a balanced layout
    * with nCells < parallelism/factor reads as "hot" by work — that is
    * a parallelism shortfall, not skew, and salting it is
    * output-invariant and parallelism-positive, just probe-replication
    * heavier; no shipped shape has it (gate shapes run nCells=16 at
    * 32 partitions). */
  private[graft] val HotWorkFactor = 3.0
  private[graft] def detectHotCellsAuto(counts: Seq[(Long, Long)],
                                        total: Long, sumSq: Double,
                                        frac: Double,
                                        parallelism: Int): Seq[Long] = {
    val fairWork = sumSq / math.max(parallelism, 1)
    counts.filter { case (_, n) =>
      n.toDouble >= frac * total &&
        n.toDouble * n.toDouble >= HotWorkFactor * fairWork
    }.map(_._1)
  }

  /** Salt factor for `skewSaltFactor=auto`, from the measured hottest
    * cell: proportional to how far past the hot threshold it is (a
    * 30 % cell at frac=0.05 splits ×12, a 8 % cell ×4 — the split cost
    * is probe replication ×S on the hot cell, so a mildly hot cell
    * gets a mild split), doubled because the r17 skew table measured
    * ×16 strictly dominating ×8 on the collapsed-cell fixture, and
    * capped at 2× the session's shuffle parallelism (S sub-cells hash
    * to ≤ S tasks — salt beyond the core count buys nothing but
    * replication). Pure — unit-testable. */
  private[graft] def autoSaltFactor(maxCellRows: Long, total: Long,
                                    frac: Double, parallelism: Int): Int = {
    val ratio = maxCellRows.toDouble / (frac * total)
    // all-Double until the final toInt: a tiny `frac` can push `ratio`
    // past Int range, where `2 * ceil(ratio).toInt` wraps negative and
    // max(2, ·) silently collapses S to the floor exactly when skew is
    // worst (ADVICE r17). Double.toInt saturates, and the parallelism
    // cap keeps the result in Int range anyway.
    math.min(math.max(2.0 * parallelism, 2.0),
      math.max(2.0, 2.0 * math.ceil(ratio))).toInt
  }

  /** Apply the salted sub-split to both sides when enabled and hot
    * cells exist. Returns the (possibly rewritten) frames. Detection
    * reads the builder-provided [[CellStats]] when available (free);
    * the corpus-lineage aggregation pass runs only for explicit conf
    * settings without stats (see the conf scaladoc above). */
  private def maybeSaltCells(corpus: DataFrame, probes: DataFrame,
                             corpusIdName: String,
                             cellStats: Option[CellStats]): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions._
    lastSaltDecision = "unsalted"
    val spark = corpus.sparkSession
    val confOpt = spark.conf.getOption(skewSaltFactorKey)
      .map(_.trim).filter(_.nonEmpty)
    val source = detectionSource(confOpt, cellStats.nonEmpty)
    if (source == "none") return (corpus, probes)
    val auto = confOpt.forall(_.equalsIgnoreCase("auto")) // unset => auto
    val fixedS = if (auto) 0 else confOpt.get.toInt
    val frac = spark.conf.get(skewCellFractionKey, "0.05").toDouble
    require(frac > 0.0 && frac <= 1.0,
      s"$skewCellFractionKey must be in (0, 1], got $frac")
    val (hotCounts, total, sumSq, minCell, maxCell) = source match {
      case "stats" =>
        val st = cellStats.get
        if (st.counts.isEmpty || st.total <= 0L) return (corpus, probes)
        val sq = st.counts.iterator
          .map { case (_, n) => n.toDouble * n.toDouble }.sum
        (st.counts, st.total, sq, st.minCell, st.maxCell)
      case _ =>
        // one aggregation pass over the corpus lineage: per-cell counts
        // (map-side combined to ≤ distinct-cells rows), then
        // total/extrema/work and the hot set read off the persisted
        // stats — the corpus itself is scanned once
        val stats = corpus.groupBy(col("cell")).agg(count(lit(1)).as("__n"))
          .persist()
        try {
          val agg = stats.agg(sum(col("__n")), min(col("cell")),
            max(col("cell")),
            sum(col("__n").cast("double") * col("__n").cast("double"))).first()
          if (agg.isNullAt(0)) return (corpus, probes) // empty corpus
          val totalP = agg.getLong(0)
          val minC = if (agg.isNullAt(1)) 0L else agg.getLong(1)
          val maxC = if (agg.isNullAt(2)) 0L else agg.getLong(2)
          val sq = if (agg.isNullAt(3)) 0.0 else agg.getDouble(3)
          // bounded collect: only cells at/over the hot threshold,
          // ≤ 1/frac rows by construction
          val hotC = stats.filter(col("cell").isNotNull &&
              col("__n") >= (frac * totalP).toLong)
            .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
          (hotC, totalP, sq, minC, maxC)
        } finally stats.unpersist()
    }
    {
      val hot =
        if (auto) detectHotCellsAuto(hotCounts, total, sumSq, frac,
          spark.sessionState.conf.numShufflePartitions)
        else detectHotCells(hotCounts, total, frac)
      if (hot.isEmpty) return (corpus, probes)
      val s =
        if (!auto) fixedS
        else autoSaltFactor(hotCounts.map(_._2).max, total, frac,
          spark.sessionState.conf.numShufflePartitions)
      // the composite key must stay injective in a Long
      if (maxCell > (Long.MaxValue - s) / s || minCell < Long.MinValue / s) {
        System.err.println(s"[graft] probeTopK skew-salt SKIPPED: cell id " +
          s"range [$minCell, $maxCell] would overflow the composite key at " +
          s"saltFactor=$s")
        return (corpus, probes)
      }
      lastSaltDecision = s"salted x$s hot=${hot.size} src=$source"
      System.err.println(s"[graft] probeTopK skew-salt: ${hot.size} hot " +
        s"cell(s) ${hot.take(8).mkString("[", ",", "]")} sub-split x$s" +
        (if (auto) " (auto)" else "") +
        s" (fraction=$frac, corpus=$total, detection=$source)")
      val hotCols = hot.map(lit)
      val sL = s.toLong
      val cSalted = corpus.withColumn("cell",
        when(col("cell").isin(hotCols: _*),
          col("cell") * sL + pmod(hash(col(corpusIdName)), lit(s)).cast("long"))
          .otherwise(col("cell") * sL))
      val pSalted = probes
        .withColumn("__salt", explode(
          when(col("cell").isin(hotCols: _*), sequence(lit(0L), lit(sL - 1L)))
            .otherwise(array(lit(0L)))))
        .withColumn("cell", col("cell") * sL + col("__salt"))
        .drop("__salt")
      (cSalted, pSalted)
    }
  }

  // session-scoped memo for the mode-selection size estimate, keyed by
  // the ANALYZED plan's semantic fingerprint: `optimizedPlan.stats`
  // costs a full optimizer pass over the probe side's lineage (the ANN
  // rows feed deep index-build trees here), and gate/bench runs rebuild
  // semantically identical probe plans repeatedly (VERDICT r16 #3 — the
  // x_ann_ivf_recall +0.66 s adjudication). Staleness risk is bounded:
  // the estimate only picks between two RESULT-EQUIVALENT modes
  // (x_ann_mode_equivalence), and file-size drift within one session
  // under an identical plan is not a shipped shape. Weak session key —
  // entries die with the session; per-session entries are LRU-capped
  // (ADVICE r17: a long-lived incremental service calling
  // embeddingNearDupsAgainst per batch builds one distinct probe plan
  // per batch, which would otherwise accumulate forever).
  private[graft] val estCacheMaxEntries = 64
  private[graft] final class EstLru
      extends java.util.LinkedHashMap[Integer, BigInt](16, 0.75f, true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[Integer, BigInt]): Boolean =
      size() > estCacheMaxEntries
  }
  private val estCache = new java.util.WeakHashMap[SparkSession, EstLru]()

  private def choosePartitioned(probes: DataFrame): Boolean = {
    val thr = probes.sparkSession.conf
      .get(probeBroadcastThresholdKey, defaultProbeBroadcastThreshold.toString)
      .toLong
    // conf extremes decide without any stats probe: -1 (the spec's
    // partitioned-forcing lever) and MaxValue (the equivalence gate's
    // broadcast-forcing lever) — no estimate can cross them
    if (thr < 0) true
    else if (thr == Long.MaxValue) false
    else {
      val est = estCache.synchronized {
        val perSession = estCache.computeIfAbsent(
          probes.sparkSession, _ => new EstLru)
        val key = Integer.valueOf(probes.queryExecution.analyzed.semanticHash())
        var v = perSession.get(key)
        if (v == null) {
          v = probes.queryExecution.optimizedPlan.stats.sizeInBytes
          perSession.put(key, v)
        }
        v
      }
      val partitioned = est > BigInt(thr)
      // one line per decision (ADVICE r16): sizeInBytes on an explode
      // fan-out can be grossly inflated, and a misestimate-driven flip
      // to the double-shuffle mode should be visible in bench logs, not
      // silent (modes are gated equivalent — this is a perf tripwire)
      System.err.println(
        s"[graft] probeTopK mode=${if (partitioned) "partitioned" else "broadcast"} " +
          s"probeEstimateBytes=$est thresholdBytes=$thr")
      partitioned
    }
  }

  private def build(corpus: DataFrame, probes: DataFrame,
                    corpusPayloadNames: Seq[String], queryPayloadName: String,
                    mode: String, table: Option[Broadcast[Array[Double]]],
                    m: Int, ksub: Int, cap: Int, tau: Double = 0.0,
                    forcePartitioned: Option[Boolean] = None,
                    cellStats: Option[CellStats] = None): DataFrame = {
    val spark = corpus.sparkSession
    // the cosine scorers' zero-norm raise is ANSI-Divide parity; under
    // a non-ANSI session the compositional plan NULL-drops instead —
    // callers route there via cosineLayoutSupported, and building the
    // fused node directly in such a session is a semantics bug
    if (mode != "sdc") require(spark.sessionState.conf.ansiEnabled,
      s"probeTopK '$mode' mode requires spark.sql.ansi.enabled=true " +
        "(its zero-norm raise mirrors the ANSI Divide); non-ANSI " +
        "sessions must use the compositional plan")
    GraftStrategy.install(spark)
    val partitioned = forcePartitioned.getOrElse(choosePartitioned(probes))
    // skew hardening applies only where skew can hurt: the partitioned
    // mode clusters on cell, the broadcast mode has no cell partitioning
    val (corpusIn, probesIn) =
      if (partitioned) maybeSaltCells(corpus, probes, "corpus_id", cellStats)
      else (corpus, probes)
    val cPlan = GraftBridge.analyzed(corpusIn)
    // re-alias EVERY probe column: in self-join shapes (the pair scan)
    // both children derive from the same subtree, so an un-aliased
    // probe column shares its exprId with a corpus column — the
    // analyzer's DeduplicateRelations then rewrites the child but not
    // the node's carried Attribute, and pruning drops the "duplicate".
    // A fresh Alias per column guarantees disjoint probe-side exprIds.
    val pPlan = GraftBridge.analyzed(
      probesIn.select(probesIn.columns.map(n => probesIn.col(n).as(n)).toIndexedSeq: _*))
    def pick(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"probeTopK: no column '$n'"))
    val node = ProbeTopKNode(
      cPlan, pPlan,
      pick(cPlan, "corpus_id"), pick(cPlan, "cell"),
      corpusPayloadNames.map(pick(cPlan, _)),
      pick(pPlan, "query_id"), pick(pPlan, queryPayloadName),
      pick(pPlan, "cell"),
      mode, table, m, ksub, cap,
      partitioned,
      tau,
      AttributeReference("ascore", DoubleType, nullable = false)())
    GraftBridge.ofRows(spark, node)
  }

  /** The fused SDC partial top-k as a DataFrame: per corpus partition,
    * the top-`preRankC` (query_id, corpus_id, ascore) per query under
    * (ascore DESC, corpus_id ASC). Finish with the caller's global
    * window rank — its input is now ≤ partitions × preRankC rows per
    * query instead of every candidate.
    */
  def partialTopK(corpus: DataFrame, probes: DataFrame,
                  table: Broadcast[Array[Double]],
                  m: Int, ksub: Int, preRankC: Int,
                  cellStats: Option[CellStats] = None): DataFrame =
    build(corpus, probes, Seq("codes", "cnorm"), "qcodes",
      "sdc", Some(table), m, ksub, preRankC, cellStats = cellStats)

  /** The fused EXACT-COSINE partial top-k: corpus (corpus_id, cell,
    * cv: array<float>) against probes (query_id, qv, cell) — the
    * [[graft.ext.Similarity.ivfTopK]] scoring fused the same way, with
    * the same bit-exact cosine as the cosineF kernel.
    */
  def partialTopKCosine(corpus: DataFrame, probes: DataFrame,
                        k: Int,
                        cellStats: Option[CellStats] = None): DataFrame =
    build(corpus, probes, Seq("cv"), "qv", "cos", None, 0, 0, k,
      cellStats = cellStats)

  /** The fused PAIR-THRESHOLD cosine scan for the near-dup self-join
    * family: every (query_id, corpus_id, ascore=cos) with
    * query_id < corpus_id and cos ≥ tau, scored inline — candidate
    * pairs below τ never exist as rows. The caller dedups pairs that
    * share two probed cells and applies its output shaping. Defaults
    * to forcing the PARTITIONED mode: in the self-join shape both
    * sides are the same corpus-sized fan-out, exactly the shape whose
    * broadcast is the per-executor memory wall; pass
    * `forcePartitioned = Some(false)` or None-with-threshold for the
    * incremental small-batch shape.
    */
  def pairsCosine(corpus: DataFrame, probes: DataFrame, tau: Double,
                  forcePartitioned: Option[Boolean] = Some(true),
                  cellStats: Option[CellStats] = None): DataFrame =
    build(corpus, probes, Seq("cv"), "qv", "cospair", None, 0, 0, 0,
      tau, forcePartitioned, cellStats)

  /** The UNORDERED fused pair-threshold scan for the incremental
    * batch-vs-store shape ([[graft.ext.Dedup.embeddingNearDupsAgainst]]):
    * corpus = the persisted store's (corpus_id, cell, cv), probes = the
    * incoming batch's multi-probed (query_id, qv, cell). Every
    * (query, candidate) pair with cosine ≥ tau is emitted inline — no
    * `query_id < corpus_id` guard and no self-exclusion, because the
    * sides are disjoint row sets and the compositional equi-join it
    * replaces has no id conjunct. Mode selection is threshold-based by
    * default: a daily batch (≤ 10⁶ rows) broadcasts and the store
    * streams shuffle-free; a backfill-sized batch (≥ 10⁷ rows — the
    * r16 verdict's named wall) trips to the cell-co-partitioned mode
    * instead of OOMing every executor.
    */
  def pairsCosineAgainst(corpus: DataFrame, probes: DataFrame, tau: Double,
                         forcePartitioned: Option[Boolean] = None,
                         cellStats: Option[CellStats] = None): DataFrame =
    build(corpus, probes, Seq("cv"), "qv", "cospairu", None, 0, 0, 0,
      tau, forcePartitioned, cellStats)
}
