package graft

import graft.functions.PartialRatio
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point (SURVEY §7.3: custom Catalyst surface).
  *
  * Registers the engine's native expressions with the session function
  * registry, so SQL users get them too:
  *
  * {{{
  *   spark.sql("SELECT partial_ratio(title, candidate) FROM pairs")
  * }}}
  *
  * Enabled via `spark.sql.extensions=graft.GraftExtensions` (GraftSession
  * sets it by default).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("partial_ratio"),
      new ExpressionInfo(classOf[PartialRatio].getName, "partial_ratio"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "partial_ratio(a, b) takes exactly 2 arguments")
        PartialRatio(children.head, children(1))
      }))
  }
}
