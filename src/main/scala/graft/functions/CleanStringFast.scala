package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused `clean_string` (utils.py:69-87) — the hot map stage of the
  * output-metadata ETL, where the composed chain paid ~10 regex matcher
  * setups per value on mostly-short strings.
  *
  * Bit-identical to [[Cleaning.cleanStringChain]] (CleaningSpec pins it on
  * the corpus plus adversarial cases); the steps replicate the chain's
  * exact pass structure, including its chained-replacement artifacts
  * (`&amp;lt;` decodes to `<` because the `&amp;` pass runs before the
  * `&lt;` pass — six sequential full passes, same order):
  *  1. runs of `[\r\n\t]+` → one space
  *  2. only when `<` or `&` present: `<[^>]*>` → space (an unterminated
  *     `<` stays literal), then the six literal entity passes
  *  3. ` ` → space; runs of 2+ spaces → one; trim ASCII spaces
  *  4. NULL when empty or no `\w` (ASCII word char, Java regex) remains
  */
object CleanStringImpl {

  /** Returns null for the reference's None cases. Input must be non-null
    * (the expression layer handles null-in → null-out, same as the chain).
    */
  def clean(s: String): String = {
    val ws = collapseCtl(s)
    val decoded =
      if (ws.indexOf('<') >= 0 || ws.indexOf('&') >= 0) {
        var x = stripTags(ws)
        x = x.replace("&nbsp;", " ")
        x = x.replace("&amp;", "&")
        x = x.replace("&lt;", "<")
        x = x.replace("&gt;", ">")
        x = x.replace("&quot;", "\"")
        x = x.replace("&#39;", "'")
        x
      } else ws
    val t = trimSpaces(collapseSpaces(decoded.replace('\u00A0', ' ')))
    if (t.isEmpty || !hasWordChar(t)) null else t
  }

  /** `[\r\n\t]+` runs → one space each. */
  private def collapseCtl(s: String): String = {
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '\r' || c == '\n' || c == '\t') {
        sb.append(' ')
        while (i < n && { val d = s.charAt(i); d == '\r' || d == '\n' || d == '\t' }) i += 1
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** `<[^>]*>` → space, globally; a `<` with no later `>` is literal. */
  private def stripTags(s: String): String = {
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        val gt = s.indexOf('>', i + 1)
        if (gt >= 0) { sb.append(' '); i = gt + 1 }
        else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Runs of 2+ ASCII spaces → one. */
  private def collapseSpaces(s: String): String = {
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      sb.append(c)
      if (c == ' ') while (i + 1 < n && s.charAt(i + 1) == ' ') i += 1
      i += 1
    }
    sb.toString
  }

  /** Leading/trailing ASCII spaces only — the builtin `trim`'s contract. */
  private def trimSpaces(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    if (a == 0 && b == s.length) s else s.substring(a, b)
  }

  /** Java-regex `\w`: ASCII letter, digit or underscore, anywhere. */
  private def hasWordChar(s: String): Boolean = {
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
          (c >= '0' && c <= '9') || c == '_') return true
      i += 1
    }
    false
  }

  def cleanUTF8(s: UTF8String): UTF8String = {
    val out = clean(s.toString)
    if (out == null) null else UTF8String.fromString(out)
  }
}

/** Codegen'd fused clean_string. NOT null-intolerant in the output
  * direction: a non-null input can produce NULL (the no-word-char
  * contract), so `nullable` is always true and the generated code
  * re-checks the result.
  */
case class CleanStringExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "clean_string"

  override protected def withNewChildInternal(newChild: Expression): CleanStringExpr =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any =
    CleanStringImpl.cleanUTF8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.CleanStringImpl.cleanUTF8($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
}

object CleanStringColumn {
  def cleanString(c: Column): Column =
    ColumnBridge.column(CleanStringExpr(ColumnBridge.expr(c)))
}
