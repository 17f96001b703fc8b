package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native dot product over two double-array columns (ANN/dedup hot path).
  *
  * Why an Expression and not `aggregate(zip_with(...))`: Spark's
  * higher-order functions are interpreted (no codegen) and allocate an
  * intermediate array per call — measured 10–20× slower on the O(n²)
  * pair-scoring loop of [[graft.operators.Similarity.cosinePairs]]. This
  * expression reads both `ArrayData` buffers in a primitive `while` loop
  * (no boxing, no copy on UnsafeArrayData) and participates in whole-stage
  * codegen via a static call.
  *
  * Summation is a sequential left fold — the same order as
  * `aggregate(..., (acc, x) => acc + x)` and DuckDB's list kernels, so
  * results stay oracle-reproducible bit-for-bit after 4dp rounding.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override protected def nullSafeEval(l: Any, r: Any): Any =
    DotProduct.dot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotProduct.dot($a, $b)")
}

object DotProduct {
  /** Tight primitive loop; also the codegen target. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }
}

object VectorOps {
  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expr(a), ColumnBridge.expr(b)))
}
