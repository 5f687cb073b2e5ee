package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Flat centroid matrix + cell ids, shipped to executors as ONE
  * broadcast block instead of riding the serialized expression tree
  * into every task binary. At the gated bench scales (≤4096 cells ×
  * 64 dims ≈ 1 MB) the in-expression form was fine; at a production
  * 100 TB index (65k cells × 1024 dims ≈ 256 MB) per-task
  * serialization becomes the stage ceiling — a broadcast ships once
  * per executor and every task reads the same local block.
  */
case class CentroidMatrix(units: Array[Float], cells: Array[Long])

/** Flat PQ codebook + per-code ‖c‖²/2 terms, broadcast for the same
  * reason as [[CentroidMatrix]] (m·ksub·dsub floats — 1 MB at the
  * standard m=16/ksub=256/dsub=64 production shape).
  */
case class PqCodebookData(codebook: Array[Float], halves: Array[Double])

/** Identity-keyed broadcast cache for kernel payloads (centroid
  * matrices, PQ codebooks, SDC tables, phrase dictionaries): a plan
  * that builds several Columns against one payload ships ONE broadcast
  * block instead of one per Column construction. The active session's
  * context is the broadcaster (all builders run on the driver).
  *
  * Keys are weak (an entry lives exactly as long as the caller's own
  * reference to the payload key — note WeakHashMap compares keys by
  * equals: reference identity for array keys, content equality for
  * collection keys like the AC dictionary Seq) and values are
  * WeakReferences, NOT
  * the Broadcast itself: the broadcast VALUE strongly reaches the key
  * array (e.g. CentroidMatrix.units sits in the driver's block manager
  * until unpersist), so a strong map value would keep its own weak key
  * reachable forever — entries would never clear and every payload
  * would stay broadcast for the session lifetime. With weak values the
  * Broadcast lives exactly as long as some plan holds it; once plans
  * drop it, ContextCleaner reaps the blocks and the next identical
  * call re-broadcasts. Distinct payloads (e.g. each Lloyd iteration's
  * new matrix) still broadcast — semantically they must. The cache is
  * cleared when the active SparkContext changes (a cross-session
  * handle would be stale).
  */
private[functions] object KernelBroadcasts {
  private val cache =
    new java.util.WeakHashMap[AnyRef, java.lang.ref.WeakReference[Broadcast[_]]]()
  private var ctx: org.apache.spark.SparkContext = _
  /** `sameAs` guards the identity key against a payload REBUILT around
    * the same key array (e.g. the same units array paired with a
    * different cells array — no current builder does that, but the
    * wrappers are public): a mismatched hit broadcasts fresh and
    * replaces the entry rather than returning the wrong payload. */
  def byKey[T: scala.reflect.ClassTag](key: AnyRef, v: => T)(
      sameAs: T => Boolean): Broadcast[T] =
    cache.synchronized {
      val sc = SparkSession.active.sparkContext
      if (sc ne ctx) { cache.clear(); ctx = sc }
      val hit = Option(cache.get(key)).flatMap(r => Option(r.get()))
        .map(_.asInstanceOf[Broadcast[T]])
        .filter(b => sameAs(b.value))
      hit.getOrElse {
        val b = sc.broadcast(v)
        cache.put(key, new java.lang.ref.WeakReference[Broadcast[_]](b))
        b
      }
    }
}

/** Native vector kernels for the similarity/dedup hot path (SURVEY.md
  * §4.3 extension layer).
  *
  * The composable form — `aggregate(zip_with(a, b, _*_), 0.0, _+_)` —
  * materializes an intermediate array per row pair and walks it through
  * two higher-order-function evaluations. At ANN scale (corpus ×
  * queries pairs) that allocation dominates. This expression loops over
  * the raw `ArrayData` in a tight codegen'd loop: zero allocation, same
  * left-to-right double accumulation (bit-identical results, so the
  * DuckDB oracles keep matching).
  */
case class DotProductFloat(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product_float expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    // mismatched dimensions must FAIL, not silently truncate to a
    // plausible-looking (and wrong) dot product
    if (y.numElements() != n)
      throw new IllegalArgumentException(
        s"dot_product_float: mismatched dimensions ($n vs ${y.numElements()})")
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "dot_product_float: mismatched dimensions (" + $n + " vs " + $b.numElements() + ")");
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductFloat =
    copy(left = newLeft, right = newRight)
}

/** `a·x + b` over Long with wraparound (Java) semantics — the universal-
  * hashing permutation MinHash needs. Plain Column arithmetic can't
  * express this under ANSI mode (overflow throws there; here it's the
  * point: odd-a multiply mod 2⁶⁴ is a bijection).
  */
case class HashPermute(child: Expression, a: Long, b: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hash_permute expects bigint, got ${child.dataType.simpleString}")

  override def nullSafeEval(x: Any): Any = a * x.asInstanceOf[Long] + b

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${a}L * $c + ${b}L")

  override protected def withNewChildInternal(newChild: Expression): HashPermute =
    copy(child = newChild)
}

/** FNV-1a 64-bit over a string's UTF-8 bytes. Chosen over the engine's
  * `xxhash64` for the dedup fingerprint/MinHash/SimHash substrate because
  * it is PORTABLE: the same value is reproducible in any engine with
  * 128-bit integer math (one xor + one multiply mod 2⁶⁴ per byte), which
  * is what lets the DuckDB oracle replicate signatures bit-for-bit.
  * Wraparound multiply needs native code under ANSI mode (same reason as
  * [[HashPermute]]). Codegen'd tight byte loop — same shape as xxhash64.
  */
case class Fnv1a64(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"fnv1a64 expects string, got ${child.dataType.simpleString}")

  override def nullSafeEval(x: Any): Any =
    VectorExpressions.fnv1a64Bytes(
      x.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0xcbf29ce484222325L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h ^ ($bytes[$i] & 0xffL)) * 0x100000001b3L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Fnv1a64 =
    copy(child = newChild)
}

/** All word-shingle FNV-1a hashes of a string in ONE byte scan:
  * `shingle_fnv(s, n)` ≡
  * `transform(wordShingles-of-s, sh -> fnv1a64(sh))` — bit-identical
  * values (same tokenizer contract as `split(s, "\\s+")` with Spark's
  * limit -1, same 0x20 joiner, same FNV byte loop as [[Fnv1a64]]) — so
  * every DuckDB oracle that replays the string pipeline keeps matching.
  *
  * Why it exists: the composable form routes through `transform` /
  * `sequence` / `slice` / `concat_ws`, all interpreted higher-order
  * expressions that allocate a token array, k slice copies, and k
  * shingle strings PER ROW. This kernel tokenizes the raw UTF-8 bytes
  * once and folds each shingle's bytes straight into the hash
  * accumulator: zero string materialization, no interpreted eval. It
  * is the substrate of minhash/simhash/jaccard/decontamination, i.e.
  * the innermost loop of a 100-TB dedup scan.
  */
case class ShingleFnv(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_fnv"

  override def checkInputDataTypes(): TypeCheckResult =
    if (n < 1)
      TypeCheckResult.TypeCheckFailure(s"shingle_fnv: n must be >= 1, got $n")
    else if (child.dataType == org.apache.spark.sql.types.StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_fnv expects string, got ${child.dataType.simpleString}")

  override def nullSafeEval(x: Any): Any =
    ShingleFnv.compute(x.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleFnv.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleFnv =
    copy(child = newChild)
}

object ShingleFnv {
  // Java \s — exactly the separator class of split(s, "\\s+"); all six
  // are single-byte in UTF-8, so byte-wise scanning is unicode-safe.
  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  private val Seed = 0xcbf29ce484222325L
  private val Prime = 0x100000001b3L

  /** Called from generated code (static forwarder). */
  def compute(s: org.apache.spark.unsafe.types.UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    // Field offsets mirroring java.lang.String.split("\\s+", -1): a
    // leading empty field when the string starts with whitespace, a
    // trailing empty field when it ends with one (callers trim, but
    // the contract must hold for ANY input to stay oracle-equivalent).
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var nf = 0
    def push(a: Int, b: Int): Unit = {
      if (nf == starts.length) {
        starts = java.util.Arrays.copyOf(starts, nf * 2)
        ends = java.util.Arrays.copyOf(ends, nf * 2)
      }
      starts(nf) = a; ends(nf) = b; nf += 1
    }
    var i = 0
    var fieldStart = 0
    while (i < len) {
      if (isWs(bytes(i))) {
        push(fieldStart, i)
        while (i < len && isWs(bytes(i))) i += 1
        fieldStart = i
      } else i += 1
    }
    push(fieldStart, len)
    val m = nf - n + 1
    if (m < 1) org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(Array.emptyLongArray)
    else {
      val out = new Array[Long](m)
      var sh = 0
      while (sh < m) {
        var h = Seed
        var j = sh
        while (j < sh + n) {
          if (j > sh) h = (h ^ 0x20L) * Prime
          var k = starts(j)
          val e = ends(j)
          while (k < e) {
            h = (h ^ (bytes(k) & 0xffL)) * Prime
            k += 1
          }
          j += 1
        }
        out(sh) = h
        sh += 1
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
    }
  }
}

/** PQ code assignment kernel: per subspace j, argmax over codes c of
  * ⟨v_j, c⟩ − ‖c‖²/2 against a driver-built flat codebook — ONE call
  * into a compiled loop per row. The composable alternative (a
  * `greatest` over m·ksub inlined dot-kernel structs) generates a
  * method so large that Janino compilation dominated the whole query
  * (~12 s fixed cost per PQ query at sf0.1; ~1 s with this kernel),
  * and it caps ksub at codegen limits — this form scales to the
  * standard 8-bit (ksub=256) codebooks. Same arithmetic order as
  * [[DotProductFloat]] (left-to-right double accumulation), so codes
  * are bit-identical to the inlined form. Never-trained codes carry
  * half = +∞ and cannot win; ties break to the lowest code.
  */
case class PqEncodeCodes(child: Expression, cb: Broadcast[PqCodebookData],
                         m: Int, ksub: Int, dsub: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  // per-instance cache of the executor-local broadcast block; transient
  // so only the tiny broadcast HANDLE rides the serialized expression
  @transient private lazy val codebook: Array[Float] = cb.value.codebook
  @transient private lazy val halves: Array[Double] = cb.value.halves

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<float>, got ${t.simpleString}")
  }

  def codesFor(v: ArrayData): ArrayData = {
    require(v.numElements() == m * dsub,
      s"pq_encode: vector of ${v.numElements()} dims, expected ${m * dsub}")
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestS = Double.NegativeInfinity
      val vOff = j * dsub
      var c = 0
      while (c < ksub) {
        val h = halves(j * ksub + c)
        if (!h.isPosInfinity) {
          val cOff = (j * ksub + c) * dsub
          var s = 0.0
          var i = 0
          while (i < dsub) {
            s += v.getFloat(vOff + i).toDouble * codebook(cOff + i).toDouble
            i += 1
          }
          s -= h
          if (s > bestS) { bestS = s; best = c }
        }
        c += 1
      }
      out(j) = best
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def nullSafeEval(x: Any): Any = codesFor(x.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // the loop lives in compiled Scala; codegen only routes the call —
      // constant-size generated code regardless of m·ksub
      val ref = ctx.addReferenceObj("pqEncoder", this, classOf[PqEncodeCodes].getName)
      s"${ev.value} = $ref.codesFor($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncodeCodes =
    copy(child = newChild)
}

/** Nearest-centroid assignment as ONE expression: argmax over a flat,
  * driver-normalized centroid matrix shipped as a [[CentroidMatrix]]
  * BROADCAST (the expression carries only the handle — the matrix
  * lands on each executor once, not in every task binary), looping in
  * compiled Scala — constant generated-code size at ANY nCells. The
  * unrolled alternative (nCells dot kernels + `greatest`) exceeds the
  * JVM's 64KB method limit around ~512 cells inside whole-stage
  * codegen and silently falls back to interpreted eval. Ranks by
  * dot(v, ĉ) (≡ cosine argmax — |v| is constant per row); ties resolve
  * to the LOWEST cell (cells are iterated in ascending id order with a
  * strict >), matching the inline `greatest((d, -cell))` form
  * bit-for-bit.
  */
case class NearestCell(child: Expression, mat: Broadcast[CentroidMatrix],
                       dim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  @transient private lazy val units: Array[Float] = mat.value.units
  @transient private lazy val cells: Array[Long] = mat.value.cells

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_cell"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_cell expects array<float>, got ${t.simpleString}")
  }

  def cellFor(v: ArrayData): Long = {
    require(v.numElements() == dim,
      s"nearest_cell: vector of ${v.numElements()} dims, expected $dim")
    var bestD = Double.NegativeInfinity
    // start at the LOWEST cell id, not a phantom 0: a degenerate vector
    // whose every dot is NaN (strict > never fires) must land in a real
    // cell. NaN dots rank below any finite dot here; only NaN/Inf
    // INPUTS can produce them. ([[NearestCellsTopK]] shares the
    // below-any-finite rule but never EMITS a NaN-scored probe — an
    // all-NaN vector probes zero cells there, while assignment must
    // land every row somewhere, hence this fallback.)
    var bestCell = cells(0)
    var c = 0
    while (c < cells.length) {
      val off = c * dim
      var s = 0.0
      var i = 0
      while (i < dim) {
        s += v.getFloat(i).toDouble * units(off + i).toDouble
        i += 1
      }
      if (s > bestD) { bestD = s; bestCell = cells(c) }
      c += 1
    }
    bestCell
  }

  override def nullSafeEval(x: Any): Any = cellFor(x.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // the loop lives in compiled Scala; codegen only routes the call
      val ref = ctx.addReferenceObj("nearestCell", this, classOf[NearestCell].getName)
      s"${ev.value} = $ref.cellFor($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCell =
    copy(child = newChild)
}

/** Top-`nProbe` nearest centroids per vector as ONE expression over a
  * broadcast flat centroid matrix ([[CentroidMatrix]] — handle in the
  * expression, block once per executor) — the QUERY-side twin of
  * [[NearestCell]]. Returns array<struct<cell:long, d:double>> ordered
  * best-first by (d desc, cell asc), where d = dot(v, matrix row) —
  * pass a driver-NORMALIZED matrix to rank by cosine (the IVF probe)
  * or the raw float matrix to get the true ⟨q,c⟩ coarse term (the
  * IVF-PQ score needs the value itself, bit-identical to the dotF
  * kernel: same float·float→double left-to-right accumulation). The
  * crossJoin+window alternative materializes and SHUFFLES
  * nQueries×nCells rows — 4B rows for a 1M-query batch against a
  * 4096-cell index; this is a pure narrow map over the queries.
  * Selection loop keeps earlier (lower) cells ahead of equal-d later
  * ones (strict > insertion over ascending cells), matching the
  * window's `orderBy(d desc, cell asc)` row_number semantics.
  * NaN dots (NaN/Inf inputs only) rank below any finite dot and are
  * never emitted: a NaN-scored cell is SKIPPED outright — a vector
  * whose every dot is NaN probes zero cells. (Before this rule, a NaN
  * from an EARLY cell parked in the buffer and the strict-> insertion
  * test could never displace it, silently outranking later finite
  * dots.)
  */
case class NearestCellsTopK(child: Expression, mat: Broadcast[CentroidMatrix],
                            dim: Int, nProbe: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  @transient private lazy val units: Array[Float] = mat.value.units
  @transient private lazy val cells: Array[Long] = mat.value.cells

  private val cellField = org.apache.spark.sql.types.StructField(
    "cell", org.apache.spark.sql.types.LongType, nullable = false)
  private val dField = org.apache.spark.sql.types.StructField(
    "d", DoubleType, nullable = false)
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(cellField, dField)),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_cells_topk"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if nProbe >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckFailure(
      s"nearest_cells_topk: nProbe must be >= 1, got $nProbe")
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_cells_topk expects array<float>, got ${t.simpleString}")
  }

  def topFor(v: ArrayData): ArrayData = {
    require(v.numElements() == dim,
      s"nearest_cells_topk: vector of ${v.numElements()} dims, expected $dim")
    val k = math.min(nProbe, cells.length)
    val bd = new Array[Double](k)
    val bc = new Array[Long](k)
    var filled = 0
    var c = 0
    while (c < cells.length) {
      val off = c * dim
      var s = 0.0
      var i = 0
      while (i < dim) {
        s += v.getFloat(i).toDouble * units(off + i).toDouble
        i += 1
      }
      // NaN scores never insert (s != s): a buffered NaN would be
      // un-displaceable under the strict-> test below and outrank
      // every later finite dot
      if (s == s) {
        // strict >: on ties the earlier (lower) cell stays ahead
        var j = filled
        while (j > 0 && s > bd(j - 1)) j -= 1
        if (j < k) {
          val last = math.min(filled, k - 1)
          var m = last
          while (m > j) { bd(m) = bd(m - 1); bc(m) = bc(m - 1); m -= 1 }
          bd(j) = s
          bc(j) = cells(c)
          if (filled < k) filled += 1
        }
      }
      c += 1
    }
    val rows = new Array[Any](filled)
    var r = 0
    while (r < filled) {
      rows(r) = org.apache.spark.sql.catalyst.InternalRow(bc(r), bd(r))
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }

  override def nullSafeEval(x: Any): Any = topFor(x.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("nearestCellsTopK", this,
        classOf[NearestCellsTopK].getName)
      s"${ev.value} = $ref.topFor($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCellsTopK =
    copy(child = newChild)
}

/** Symmetric PQ distance (SDC — Jégou et al. TPAMI 2011 §III.A): the
  * approximate dot product of TWO PQ-encoded vectors,
  * Σ_j table[(j·ksub + aj)·ksub + bj] = ⟨decode(a), decode(b)⟩, via a
  * single shared m·ksub² code-pair table built once on the driver and
  * BROADCAST. This is the scoring kernel for the all-corpus /
  * self-join ANN shapes (near-dup pre-filtering, corpus-as-query-batch
  * top-k pre-ranking): asymmetric ADC needs an m·ksub LUT PER QUERY —
  * per-query anything is ruled out when queries = corpus (a 1M-query
  * batch would broadcast 1M LUTs) — while SDC's table is query-
  * independent (4 MB at m=8/ksub=256) and each candidate pair costs m
  * array reads. Both codes must come from the SAME codebook.
  */
case class PqSdcScore(left: Expression, right: Expression,
                      table: Broadcast[Array[Double]], m: Int, ksub: Int)
    extends BinaryExpression {

  @transient private lazy val t: Array[Double] = table.value

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_sdc_score"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(org.apache.spark.sql.types.IntegerType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pq_sdc_score expects (array<int>, array<int>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  def scoreFor(a: ArrayData, b: ArrayData): Double = {
    require(a.numElements() == m && b.numElements() == m,
      s"pq_sdc_score: codes of ${a.numElements()}/${b.numElements()} subspaces, expected $m")
    var s = 0.0
    var j = 0
    while (j < m) {
      s += t((j * ksub + a.getInt(j)) * ksub + b.getInt(j))
      j += 1
    }
    s
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    scoreFor(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ref = ctx.addReferenceObj("pqSdc", this, classOf[PqSdcScore].getName)
      s"${ev.value} = $ref.scoreFor($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqSdcScore =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  private def expr(c: Column) = GraftBridge.expression(c)

  /** dot(a, b) over array<float>, accumulated in double. */
  def dotF(a: Column, b: Column): Column =
    GraftBridge.column(DotProductFloat(expr(a), expr(b)))

  /** ||a||, via the same kernel. */
  def normF(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(dotF(a, a))

  /** cosine(a, b) — identical math to the composable
    * [[graft.ext.Similarity.cosine]], far less allocation.
    */
  def cosineF(a: Column, b: Column): Column = dotF(a, b) / (normF(a) * normF(b))

  /** wraparound a·x + b (see [[HashPermute]]). */
  def hashPermute(x: Column, a: Long, b: Long): Column =
    GraftBridge.column(HashPermute(expr(x), a, b))

  /** portable FNV-1a 64-bit string hash (see [[Fnv1a64]]). */
  def fnv1a64(s: Column): Column =
    GraftBridge.column(Fnv1a64(expr(s)))

  /** Driver-side FNV-1a 64 over raw bytes — the SAME constants and
    * byte loop as [[Fnv1a64]]'s eval/codegen, shared so every
    * driver-side consumer (k-means|| sampling keys, artifact byte
    * pins) stays bit-identical to the engine expression by
    * construction instead of by hand-copied constants.
    */
  def fnv1a64Bytes(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L
      i += 1
    }
    h
  }

  /** single-pass word-shingle FNV hashes (see [[ShingleFnv]]). */
  def shingleFnv(s: Column, n: Int): Column =
    GraftBridge.column(ShingleFnv(expr(s), n))

  // kernel payloads (centroid matrices, codebooks, SDC tables, phrase
  // dictionaries) ship as broadcast blocks — once per executor — never
  // inside the serialized expression (= every task binary); see
  // [[KernelBroadcasts]].
  private def bcByKey[T: scala.reflect.ClassTag](key: AnyRef, v: => T)(
      sameAs: T => Boolean): Broadcast[T] =
    KernelBroadcasts.byKey(key, v)(sameAs)

  /** nearest-centroid argmax over a flat driver-normalized matrix
    * (see [[NearestCell]]) — the many-cell IVF assignment kernel. */
  def nearestCell(v: Column, units: Array[Float], cells: Array[Long],
                  dim: Int): Column =
    GraftBridge.column(NearestCell(expr(v),
      bcByKey(units, CentroidMatrix(units, cells))(_.cells eq cells), dim))

  /** top-nProbe nearest centroids with their dot values
    * (see [[NearestCellsTopK]]) — the IVF/IVF-PQ query-probe kernel. */
  def nearestCellsTopK(v: Column, units: Array[Float], cells: Array[Long],
                       dim: Int, nProbe: Int): Column =
    GraftBridge.column(NearestCellsTopK(expr(v),
      bcByKey(units, CentroidMatrix(units, cells))(_.cells eq cells), dim, nProbe))

  /** PQ code assignment against a flat codebook (see [[PqEncodeCodes]]). */
  def pqEncode(v: Column, codebook: Array[Float], halves: Array[Double],
               m: Int, ksub: Int, dsub: Int): Column =
    GraftBridge.column(PqEncodeCodes(expr(v),
      bcByKey(codebook, PqCodebookData(codebook, halves))(_.halves eq halves),
      m, ksub, dsub))

  /** symmetric PQ code-pair dot score against a shared broadcast
    * m·ksub² table (see [[PqSdcScore]]). */
  def pqSdcScore(a: Column, b: Column, table: Array[Double],
                 m: Int, ksub: Int): Column =
    pqSdcScore(a, b, sdcTableBroadcast(table), m, ksub)

  /** The cached broadcast handle for an SDC table — the SAME block the
    * [[pqSdcScore]] kernel ships (identity-keyed), exposed so a
    * whole-operator consumer (the fused SDC top-k plan) scores against
    * one table block instead of broadcasting a second copy. */
  def sdcTableBroadcast(table: Array[Double]): Broadcast[Array[Double]] =
    bcByKey(table, table)(_ eq table)

  /** [[pqSdcScore]] over an ALREADY-broadcast table — callers scoring
    * several column pairs against one table (pair score + both
    * self-norms) broadcast it once and reuse the handle. */
  def pqSdcScore(a: Column, b: Column, table: Broadcast[Array[Double]],
                 m: Int, ksub: Int): Column =
    GraftBridge.column(PqSdcScore(expr(a), expr(b), table, m, ksub))

  /** SpaceSaving heavy-hitters aggregate (see [[SpaceSavingAgg]]):
    * `array<struct<key, est, err, total>>` sorted by estimate.
    */
  def spaceSavingTopK(key: Column, capacity: Int): Column =
    GraftBridge.column(SpaceSavingAgg(expr(key), capacity).toAggregateExpression())
}
