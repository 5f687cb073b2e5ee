package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}

/** Unicode normalization as a codegen'd expression — the canonical
  * first step of text curation (dedup hashes, tokenizers, and language
  * ID all assume one byte form per grapheme; crawled text mixes NFC/NFD
  * freely, so "café" can arrive as 4 or 5 codepoints and split every
  * downstream hash). Spark ships no normalizer builtin; a Scala UDF
  * would break whole-stage codegen in exactly the hot path (the full
  * corpus text scan), so this is a native expression like [[Fnv1a64]].
  *
  * `form` is NFC/NFD/NFKC/NFKD (ICU-free: `java.text.Normalizer`, the
  * JDK's Unicode implementation). NFC for byte-canonical storage; NFKC
  * for aggressive compatibility folding (ligatures, width variants)
  * before hashing/token counting.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private val normForm = java.text.Normalizer.Form.valueOf(form)

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize expects string, got ${child.dataType.simpleString}")

  override def nullSafeEval(x: Any): Any = {
    val s = x.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(s, normForm))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($c.toString(),
         |    java.text.Normalizer.Form.$form));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object TextNormalize {
  private def wrap(s: Column, form: String): Column =
    GraftBridge.column(UnicodeNormalize(GraftBridge.expression(s), form))

  /** canonical composition (é as one codepoint) */
  def nfc(s: Column): Column = wrap(s, "NFC")

  /** compatibility composition (also folds ligatures/width variants) */
  def nfkc(s: Column): Column = wrap(s, "NFKC")
}
