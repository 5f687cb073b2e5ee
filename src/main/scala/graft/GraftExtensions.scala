package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.DotProductFloat

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
    ext.injectFunction((
      FunctionIdentifier("dot_product_float"),
      new ExpressionInfo(classOf[DotProductFloat].getName, "dot_product_float"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "dot_product_float(a, b) takes exactly 2 arguments")
        DotProductFloat(children.head, children(1))
      }))
  }
}
