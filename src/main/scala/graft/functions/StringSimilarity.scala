package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** String-similarity kernels for record linkage (the "match dirty
  * entity names against the master list" scoring step that follows
  * [[graft.ext.Linkage]]'s candidate generation).
  *
  * Both kernels operate on the raw UTF-8 BYTES of the string — no
  * decode, no allocation beyond the DP state — which is also exactly
  * the semantics DuckDB's `jaro_winkler_similarity` /
  * `damerau_levenshtein` implement, so the correctness oracle replays
  * them with the stock functions. (On ASCII, bytes == characters; on
  * multi-byte text both engines agree with each other, while
  * codepoint-based libraries differ — document the contract, don't
  * hide it.)
  *
  * Like [[LcsLength]], the recurrences are sequential per row (Jaro's
  * greedy match assignment, DL's row-carried DP), so they cannot be
  * composed from Spark's parallel higher-order functions — the custom
  * codegen'd Expression case. Per-row cost is O(|a|·|b|); the domain
  * is entity names / short titles, so truncate document-scale inputs
  * upstream.
  */

/** Jaro–Winkler similarity in [0,1] (Winkler 1990), byte-based.
  *
  * Jaro: greedy in-window match assignment (window = ⌊max_len/2⌋−1),
  * transpositions = half the matched bytes out of order,
  * sim = (m/|a| + m/|b| + (m−t)/m) / 3. Winkler boost: only when
  * jaro > 0.7, add prefix·0.1·(1−jaro) for a common prefix capped at
  * 4 bytes — the RapidFuzz/DuckDB convention, mirrored operation-for-
  * operation (left-associated float arithmetic) so the oracle
  * comparison is bit-exact, not merely close. Either side empty → 0.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler expects (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  /** Shared kernel — codegen routes here too (constant-size generated
    * code, one JIT-hot method; the [[LcsLength]] pattern).
    */
  def jw(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.getBytes
    val s2 = b.getBytes
    val la = s1.length
    val lb = s2.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val m1 = new Array[Boolean](la)
    val m2 = new Array[Boolean](lb)
    var matches = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    val jaro = (m / la + m / lb + (m - t / 2) / m) / 3.0
    if (jaro > 0.7) {
      val maxP = math.min(4, math.min(la, lb))
      var p = 0
      while (p < maxP && s1(p) == s2(p)) p += 1
      jaro + p * 0.1 * (1.0 - jaro)
    } else jaro
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    jw(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ref = ctx.addReferenceObj("jwKernel", this, classOf[JaroWinkler].getName)
      s"${ev.value} = $ref.jw($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

/** UNRESTRICTED Damerau–Levenshtein distance (Lowrance & Wagner 1975),
  * byte-based: minimum insert/delete/substitute/transpose edits where
  * a transposed pair may be edited again later — `ca → abc` is 2
  * (transpose to `ac`, insert `b`), where the restricted/OSA variant
  * says 3. This is the variant DuckDB's `damerau_levenshtein`
  * implements, so the oracle uses the stock function.
  *
  * Full (|a|+2)×(|b|+2) DP with the 256-entry last-occurrence table —
  * O(|a|·|b|) space per row (unlike the rolling-row kernels): entity
  * names and titles only; truncate long inputs upstream.
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"damerau_levenshtein expects (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  def dl(a: UTF8String, b: UTF8String): Int = {
    val s1 = a.getBytes
    val s2 = b.getBytes
    val la = s1.length
    val lb = s2.length
    if (la == 0) return lb
    if (lb == 0) return la
    val inf = la + lb
    // h is (la+2) x (lb+2), flattened; h(i)(j) = h(i*(lb+2)+j)
    val w = lb + 2
    val h = new Array[Int]((la + 2) * w)
    h(0) = inf
    var i = 0
    while (i <= la) { h((i + 1) * w) = inf; h((i + 1) * w + 1) = i; i += 1 }
    var j = 0
    while (j <= lb) { h(j + 1) = inf; h(w + j + 1) = j; j += 1 }
    val da = new Array[Int](256)
    i = 1
    while (i <= la) {
      var db = 0
      val c1 = s1(i - 1) & 0xff
      j = 1
      while (j <= lb) {
        val c2 = s2(j - 1) & 0xff
        val i1 = da(c2)
        val j1 = db
        var cost = 1
        if (c1 == c2) { cost = 0; db = j }
        val sub = h(i * w + j) + cost
        val ins = h((i + 1) * w + j) + 1
        val del = h(i * w + j + 1) + 1
        val tra = h(i1 * w + j1) + (i - i1 - 1) + 1 + (j - j1 - 1)
        var best = sub
        if (ins < best) best = ins
        if (del < best) best = del
        if (tra < best) best = tra
        h((i + 1) * w + j + 1) = best
        j += 1
      }
      da(c1) = i
      i += 1
    }
    h((la + 1) * w + lb + 1)
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    dl(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ref = ctx.addReferenceObj("dlKernel", this,
        classOf[DamerauLevenshtein].getName)
      s"${ev.value} = $ref.dl($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}

object StringSimilarity {

  /** Jaro–Winkler similarity of two string columns, double in [0,1]. */
  def jaroWinkler(a: Column, b: Column): Column =
    GraftBridge.column(JaroWinkler(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Unrestricted Damerau–Levenshtein distance of two string columns. */
  def damerauLevenshtein(a: Column, b: Column): Column =
    GraftBridge.column(DamerauLevenshtein(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
