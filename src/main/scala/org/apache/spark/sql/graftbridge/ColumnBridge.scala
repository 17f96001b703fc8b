package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression conversions — the
  * supported way for an external library to register custom Catalyst
  * expressions as `Column`s in Spark 4.x (the constructors moved behind
  * `org.apache.spark.sql.classic` in SPARK-49700).
  */
object ColumnBridge {
  def expr(c: Column): Expression  = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
