package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass corpus tokenizer (F23's `tokenize`, the hot inner loop of
  * the whole `text_*`/`curation_*` family).
  *
  * Semantics are EXACTLY the original builtin chain — and therefore the
  * DuckDB oracles' replay:
  * {{{ filter(split(regexp_replace(lower(c), "[^a-z\\- ]", " "), " +"), len > 1) }}}
  * i.e. Unicode-lowercase (the same `UTF8String.toLowerCase` the `lower`
  * builtin uses), every char outside `[a-z-]` acts as a separator, and
  * only tokens longer than one char survive. The fused form does one
  * char scan and allocates only the surviving tokens — no intermediate
  * lowered+substituted string row, no regex engine, no split array that
  * the filter immediately shrinks, and no interpreted higher-order
  * lambda. TokenizerSpec pins equality against the builtin chain on the
  * real corpus plus adversarial unicode.
  */
object Tokenizer {

  def tokensUTF8(s: UTF8String): ArrayData = {
    val lower = s.toLowerCase.toString
    val n = lower.length
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    var start = -1
    while (i <= n) {
      val isTokChar = i < n && {
        val c = lower.charAt(i)
        (c >= 'a' && c <= 'z') || c == '-'
      }
      if (isTokChar) { if (start < 0) start = i }
      else if (start >= 0) {
        if (i - start > 1) out.add(UTF8String.fromString(lower.substring(start, i)))
        start = -1
      }
      i += 1
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size())))
  }
}

/** Codegen'd fused text→shingles: tokenize (exactly [[Tokenizer]]'s
  * semantics) and build the DISTINCT word n-gram shingles in the same
  * pass, preserving first-occurrence order (= `array_distinct` over the
  * `transform(sequence…, slice+array_join)` chain it replaces, which ran
  * through the interpreted higher-order path per position). Documents
  * with fewer than `n` tokens yield an empty array — the original
  * `when(size >= n, …)` guard.
  */
object Shingles {
  def shinglesUTF8(s: UTF8String, n: Int): ArrayData = {
    val toks = Tokenizer.tokensUTF8(s)
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(new Array[AnyRef](0))
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= m - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks.getUTF8String(i + j).toString)
        j += 1
      }
      seen.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    new GenericArrayData(seen.toArray(new Array[AnyRef](seen.size())))
  }
}

/** Codegen'd word-bigram array from a token array — replaces the
  * `transform(sequence, concat_ws(element_at, element_at))` chain that ran
  * every position through the interpreted higher-order path. concat_ws
  * semantics preserved (null elements skipped), though fused-tokenizer
  * arrays never carry nulls.
  */
object Bigrams {
  def bigramsOf(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    if (n < 2) return new GenericArrayData(new Array[AnyRef](0))
    val out = new Array[AnyRef](n - 1)
    var i = 0
    while (i < n - 1) {
      val a = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      val b = if (toks.isNullAt(i + 1)) null else toks.getUTF8String(i + 1)
      out(i) =
        if (a == null && b == null) UTF8String.EMPTY_UTF8
        else if (a == null) b
        else if (b == null) a
        else UTF8String.fromString(a.toString + " " + b.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class BigramsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_bigrams"

  override protected def withNewChildInternal(newChild: Expression): BigramsExpr =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any =
    Bigrams.bigramsOf(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Bigrams.bigramsOf($c)")
}

object BigramsColumn {
  def bigrams(c: Column): Column =
    ColumnBridge.column(BigramsExpr(ColumnBridge.expr(c)))
}

case class TextShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_shingles"

  override protected def withNewChildInternal(newChild: Expression): TextShinglesExpr =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any =
    Shingles.shinglesUTF8(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Shingles.shinglesUTF8($c, $n)")
}

object ShinglesColumn {
  def shingles(c: Column, n: Int): Column =
    ColumnBridge.column(TextShinglesExpr(ColumnBridge.expr(c), n))
}

/** Codegen'd fused tokenizer: one static call per document inside
  * whole-stage codegen (the [[PorterStem]] pattern).
  */
case class TokenizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_tokenize"

  override protected def withNewChildInternal(newChild: Expression): TokenizeExpr =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any =
    Tokenizer.tokensUTF8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Tokenizer.tokensUTF8($c)")
}

object TokenizeColumn {
  def tokenize(c: Column): Column =
    ColumnBridge.column(TokenizeExpr(ColumnBridge.expr(c)))
}
