package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProductFloat, Fnv1a64, HashPermute, ShingleFnv, SpaceSavingAgg, UnicodeNormalize}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions with the SQL function registry, so
  * `spark.sql("SELECT dot_product_float(a, b) ...")` works wherever the
  * extension is configured:
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-operator tier: plans AsOfJoinNode as the native streaming
    // merge exec (AsOfJoin.asofNative also self-installs the strategy
    // via experimental.extraStrategies for unconfigured sessions)
    ext.injectPlannerStrategy(_ => graft.plans.GraftStrategy)
    // optimizer tier: left-only filters sink through the custom node
    // so they still reach the scan, and projections narrow the left
    // child (Catalyst's own pruning skips nodes it doesn't know)
    ext.injectOptimizerRule(_ => graft.plans.PushFilterThroughAsOfJoin)
    ext.injectOptimizerRule(_ => graft.plans.PruneAsOfJoinLeft)
    ext.injectFunction((
      FunctionIdentifier("dot_product_float"),
      new ExpressionInfo(classOf[DotProductFloat].getName, "dot_product_float"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "dot_product_float(a, b) takes exactly 2 arguments")
        DotProductFloat(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("hash_permute"),
      new ExpressionInfo(classOf[HashPermute].getName, "hash_permute"),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          "hash_permute(x, a, b) takes exactly 3 arguments (a, b literal bigints)")
        def lit(e: Expression, name: String): Long = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v.toLong
          case _ => throw new IllegalArgumentException(s"hash_permute: $name must be a literal integer")
        }
        HashPermute(children.head, lit(children(1), "a"), lit(children(2), "b"))
      }))
    ext.injectFunction((
      FunctionIdentifier("fnv1a64"),
      new ExpressionInfo(classOf[Fnv1a64].getName, "fnv1a64"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "fnv1a64(s) takes exactly 1 argument")
        Fnv1a64(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("shingle_fnv"),
      new ExpressionInfo(classOf[ShingleFnv].getName, "shingle_fnv"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "shingle_fnv(s, n) takes exactly 2 arguments (n a literal integer)")
        val n = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
          case _ => throw new IllegalArgumentException("shingle_fnv: n must be a literal integer")
        }
        ShingleFnv(children.head, n)
      }))
    for ((name, form) <- Seq("unicode_nfc" -> "NFC", "unicode_nfkc" -> "NFKC")) {
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[UnicodeNormalize].getName, name),
        (children: Seq[Expression]) => {
          require(children.size == 1, s"$name(s) takes exactly 1 argument")
          UnicodeNormalize(children.head, form)
        }))
    }
    ext.injectFunction((
      FunctionIdentifier("space_saving_topk"),
      new ExpressionInfo(classOf[SpaceSavingAgg].getName, "space_saving_topk"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "space_saving_topk(key, capacity) takes exactly 2 arguments (capacity a literal integer)")
        val cap = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
          case _ => throw new IllegalArgumentException(
            "space_saving_topk: capacity must be a literal integer")
        }
        SpaceSavingAgg(children.head, cap)
      }))
  }
}
