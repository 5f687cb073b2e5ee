package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Sequence-alignment kernels for generation-eval (ROUGE-L) and fuzzy
  * matching.
  *
  * The LCS recurrence is inherently sequential per row (dp[i][j] reads
  * dp[i][j-1] in the SAME row), so it cannot be composed from Spark's
  * parallel higher-order functions (`transform` offers no left-to-right
  * carry) — exactly the "custom Catalyst Expression beats UDF" case: a
  * tight two-row DP loop in codegen, zero per-cell allocation, O(min
  * work) per row, still inside whole-stage codegen.
  */

/** Length of the longest common subsequence of two `array<string>`
  * token sequences — the ROUGE-L core. O(n·m) time, O(m) space
  * (two rolling int rows); the right side's tokens are materialized
  * once per row so the inner loop is comparison-only.
  *
  * Scale contract: per-row cost is |ref|·|hyp| token comparisons —
  * sentence/summary-sized sequences (the metric's real domain) are
  * microseconds; for document-scale inputs cap or truncate upstream.
  */
case class LcsLength(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lcs_length expects (array<string>, array<string>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  /** Shared kernel — codegen routes here too (the loop is identical
    * either way and the JIT sees one hot method; constant-size
    * generated code, the PqEncodeCodes pattern).
    */
  def lcs(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    val m = b.numElements()
    if (n == 0 || m == 0) return 0
    val bs = new Array[UTF8String](m)
    var j = 0
    while (j < m) { bs(j) = b.getUTF8String(j); j += 1 }
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var i = 0
    while (i < n) {
      val ai = a.getUTF8String(i)
      j = 0
      while (j < m) {
        cur(j + 1) =
          if (ai == bs(j)) prev(j) + 1
          else math.max(cur(j), prev(j + 1))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m)
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    lcs(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ref = ctx.addReferenceObj("lcsKernel", this, classOf[LcsLength].getName)
      s"${ev.value} = $ref.lcs($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LcsLength =
    copy(left = newLeft, right = newRight)
}

/** Smith–Waterman LOCAL alignment score (Smith & Waterman 1981) over
  * two token sequences — the edit-tolerant span detector: a benchmark
  * answer embedded in a document with a few token substitutions still
  * aligns with a high score, where exact n-gram containment
  * (x_decontaminate) misses it. H[i][j] = max(0, diag + s(aᵢ,bⱼ),
  * up + gap, left + gap), answer = max cell; all-negative regions
  * reset to 0, so the score reads "best locally-copied span".
  *
  * Same rolling two-row kernel and scale contract as [[LcsLength]]:
  * O(n·m) per row, sentence/window-sized inputs.
  */
case class SwScore(left: Expression, right: Expression,
                   matchScore: Int, mismatch: Int, gap: Int)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sw_score expects (array<string>, array<string>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  def sw(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    val m = b.numElements()
    if (n == 0 || m == 0) return 0
    val bs = new Array[UTF8String](m)
    var j = 0
    while (j < m) { bs(j) = b.getUTF8String(j); j += 1 }
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var best = 0
    var i = 0
    while (i < n) {
      val ai = a.getUTF8String(i)
      j = 0
      while (j < m) {
        val diag = prev(j) + (if (ai == bs(j)) matchScore else mismatch)
        val h = math.max(0,
          math.max(diag, math.max(prev(j + 1) + gap, cur(j) + gap)))
        cur(j + 1) = h
        if (h > best) best = h
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    best
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    sw(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ref = ctx.addReferenceObj("swKernel", this, classOf[SwScore].getName)
      s"${ev.value} = $ref.sw($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SwScore =
    copy(left = newLeft, right = newRight)
}

object TextAlign {
  /** lcs_length(ref_tokens, hyp_tokens) over array<string>. */
  def lcsLength(a: Column, b: Column): Column =
    GraftBridge.column(LcsLength(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** sw_score(ref_tokens, hyp_tokens) — local alignment with the
    * classic +2/−1/−1 scoring by default.
    */
  def swScore(a: Column, b: Column, matchScore: Int = 2,
              mismatch: Int = -1, gap: Int = -1): Column =
    GraftBridge.column(SwScore(
      GraftBridge.expression(a), GraftBridge.expression(b),
      matchScore, mismatch, gap))
}
