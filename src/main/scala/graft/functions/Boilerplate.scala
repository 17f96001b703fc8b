package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Main-content extraction (boilerplate removal) — the block-level
  * link-density family (jusText, Kohlschütter's Boilerpipe): segment a
  * page into block-level elements, score each block by how much of its
  * text lives inside anchors, and keep only low-link-density blocks of
  * non-trivial length. A training pipeline that ships raw `html_text`
  * ships the nav bars and footers of every page on a site; this tier is
  * what strips the sitewide chrome before dedup/quality ever run.
  *
  * Beyond-reference by design (the reference has no HTML source at all);
  * the variant implemented here measures density in TOKENS rather than
  * characters — same discrimination on real chrome (nav/footer blocks are
  * all-anchor, content blocks are mostly plain text), but exactly
  * replayable arithmetic for the oracle.
  *
  * Everything stays inside whole-stage codegen: [[blocks]] is a native
  * Catalyst expression (one static scan call per page row), the rest
  * are codegen'd regexp/string Column compositions — never higher-order
  * lambdas, which are interpreted and would take the whole projection
  * out of codegen on the hot path. The intended shape at scale is
  * EXPLODED block rows — a real page has ~10²–10³ blocks, so per-block
  * work distributes and the per-doc reassembly is one hash aggregate.
  */
object Boilerplate {

  /** Block-level segmentation: a single depth-tracking scan over the
    * page, splitting at every `<p>`/`<div>` open or close boundary and
    * emitting each non-blank segment that lies inside at least one
    * block element, in document order — the jusText/Boilerpipe
    * segmentation model. NESTING-correct by construction (the r15
    * regex form paired an outer `<div>` with the FIRST inner close, so
    * real nav chrome — nested divs — truncated and leaked): for
    * `<div>nav <div>inner</div> tail</div>` the segments are `nav `,
    * `inner`, `tail`, each scored separately. The tag-name check
    * requires a delimiter after the name (`<pre>`/`<picture>` are not
    * `p`-blocks); matching is case-insensitive; self-closing block tags
    * act as a boundary without changing depth; whitespace-only segments
    * (the gaps between adjacent blocks in nested markup) are dropped;
    * inline markup inside a segment passes through raw for
    * [[blockText]]/[[linkText]] to score. Comments and script/style
    * rawtext are skipped wholesale at any depth (r16): block-tag text
    * inside a script string or comment must neither corrupt the depth
    * track nor surface as a segment — the same rawtext rule as
    * [[HtmlText]]'s extractor.
    *
    * One static JVM call per page row inside whole-stage codegen (the
    * `HtmlTextExtract` pattern) — NOT a regex + higher-order lambda,
    * which would fall out of codegen on the hot path.
    */
  def blocks(body: Column): Column =
    ColumnBridge.column(HtmlBlocksExtract(ColumnBridge.expr(body)))

  /** A block's visible text: inline tags stripped. The fixture (like
    * sane HTML) separates inline elements with literal whitespace, so
    * stripping with the empty string never fuses adjacent words.
    */
  def blockText(raw: Column): Column =
    trim(regexp_replace(raw, "<[^>]*>", ""))

  /** The block's anchor-text run — the numerator of link density (the
    * word boundary keeps `<abbr>`/`<article>` out of the anchor class).
    */
  def linkText(raw: Column): Column =
    trim(array_join(regexp_extract_all(raw, lit("(?s)<a\\b[^>]*>(.*?)</a>"), lit(1)), " "))

  /** Whitespace token count; empty string counts 0 (split of "" yields
    * one empty element). HOF-free on purpose: `filter()` is a
    * CodegenFallback higher-order function and this runs once per
    * EXPLODED block row — the hot path — so the empty case is handled
    * with a `when` instead (inputs come trimmed from [[blockText]] /
    * [[linkText]], so split never yields interior empties).
    */
  def tokenCount(text: Column): Column =
    when(length(text) === 0, lit(0L))
      .otherwise(size(split(text, "\\s+")).cast("long"))

  /** The content verdict: link density (anchor tokens / all tokens)
    * under `maxLinkDensity` AND at least `minTokens` tokens. The density
    * guard kills nav/footer chrome (density → 1); the length guard kills
    * the one-line fragments that survive it (copyright lines, breadcrumb
    * stubs). A link-BEARING block with enough plain text passes — the
    * case a naive "has links ⇒ boilerplate" rule misclassifies.
    */
  def isContent(nToks: Column, nLinkToks: Column,
      minTokens: Int = 3, maxLinkDensity: Double = 0.35): Column =
    (nLinkToks.cast("double") / greatest(nToks.cast("double"), lit(1.0))
      < lit(maxLinkDensity)) && (nToks >= lit(minTokens.toLong))

  /** The depth-tracking segment scan behind [[blocks]] — static so
    * codegen calls it directly. See [[blocks]] for semantics.
    */
  def segments(html: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    val buf = new java.lang.StringBuilder(256)
    var depth = 0
    def emit(): Unit = {
      var i = 0
      var blank = true
      while (blank && i < buf.length) {
        if (!Character.isWhitespace(buf.charAt(i))) blank = false
        i += 1
      }
      if (!blank) out += buf.toString
      buf.setLength(0)
    }
    // s[i] == '<': classify the tag. Returns the index AFTER the tag's
    // '>' when it is a p/div open/close (handling it in-place), or -1
    // when it is not a block tag (caller copies the '<' through).
    def blockTag(s: String, i: Int): Int = {
      val n = s.length
      var j = i + 1
      val closing = j < n && s.charAt(j) == '/'
      if (closing) j += 1
      // tag name: p | div, case-insensitive, delimiter-terminated
      val nameLen =
        if (j < n && (s.charAt(j) == 'p' || s.charAt(j) == 'P')) 1
        else if (j + 2 < n && "div".equalsIgnoreCase(s.substring(j, math.min(j + 3, n)))) 3
        else -1
      if (nameLen < 0) return -1
      val after = j + nameLen
      if (after < n) {
        val c = s.charAt(after)
        if (c != '>' && c != '/' && !Character.isWhitespace(c)) return -1
      }
      var k = s.indexOf('>', after)
      if (k < 0) k = n - 1 // unterminated tag: consume to EOF
      val selfClosing = !closing && k > i && s.charAt(k - 1) == '/'
      if (depth >= 1) emit() // boundary: flush the running segment
      if (closing) { if (depth > 0) depth -= 1 }
      else if (!selfClosing) {
        if (depth == 0) buf.setLength(0)
        depth += 1
      }
      k + 1
    }
    // comments and script/style rawtext are skipped WHOLESALE at any
    // depth: real pages carry block-tag text inside script strings
    // (`var nav = "<div>…</div>"`) and comments, which would corrupt
    // the depth track and surface junk segments; and script/style
    // content is code, not visible text — it must never reach a
    // segment (same rawtext rule as HtmlText's extractor). Matching is
    // to the first close (rawtext cannot nest per HTML parsing rules);
    // unterminated constructs consume to EOF.
    def skipRegion(s: String, i: Int): Int = {
      val n = s.length
      if (s.startsWith("<!--", i)) {
        val e = s.indexOf("-->", i + 4)
        return if (e < 0) n else e + 3
      }
      for (name <- Seq("script", "style")) {
        if (i + 1 + name.length <= n &&
          s.regionMatches(true, i + 1, name, 0, name.length)) {
          val after = i + 1 + name.length
          val delim = after >= n || s.charAt(after) == '>' ||
            s.charAt(after) == '/' || Character.isWhitespace(s.charAt(after))
          if (delim) {
            var j = s.indexOf('<', after)
            while (j >= 0 && !(j + 2 + name.length <= n && s.charAt(j + 1) == '/' &&
              s.regionMatches(true, j + 2, name, 0, name.length)))
              j = s.indexOf('<', j + 1)
            if (j < 0) return n
            val e = s.indexOf('>', j)
            return if (e < 0) n else e + 1
          }
        }
      }
      -1
    }
    var i = 0
    val n = html.length
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        val skipped = skipRegion(html, i)
        if (skipped >= 0) i = skipped
        else {
          val next = blockTag(html, i)
          if (next >= 0) i = next
          else { if (depth >= 1) buf.append(c); i += 1 }
        }
      } else {
        if (depth >= 1) buf.append(c)
        i += 1
      }
    }
    if (depth >= 1) emit() // unclosed trailing block
    out.toArray
  }

  def segmentsUTF8(s: UTF8String): ArrayData = {
    val segs = segments(s.toString)
    val arr = new Array[Any](segs.length)
    var i = 0
    while (i < segs.length) { arr(i) = UTF8String.fromString(segs(i)); i += 1 }
    new GenericArrayData(arr)
  }
}

/** Codegen'd block segmentation (one static call per page row inside
  * whole-stage codegen, the `HtmlTextExtract` pattern).
  */
case class HtmlBlocksExtract(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "html_blocks"

  override protected def withNewChildInternal(newChild: Expression): HtmlBlocksExtract =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any =
    Boilerplate.segmentsUTF8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Boilerplate.segmentsUTF8($c)")
}
