package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Page charset detection + decode — the WET-stage step between the HTTP
  * split and text extraction: real crawled HTML declares its encoding in
  * a byte-order mark, in the Content-Type header's `charset` parameter,
  * or (when the server lies or says nothing) in a `<meta charset>` /
  * `<meta http-equiv>` tag, or not at all. The precedence implemented is
  * the WHATWG encoding-sniffing one a real pipeline uses:
  *
  *   1. BOM (UTF-8 / UTF-16LE / UTF-16BE) — above the header, because
  *      servers lie about charset far more often than documents carry a
  *      wrong BOM (WHATWG "decode" step 1);
  *   2. the header `charset` parameter;
  *   3. the FIRST meta declaration within the first [[preludeBytes]]
  *      bytes of the body (WHATWG prescan is bounded at 1024 bytes — a
  *      late declaration buried after kilobytes of markup is ignored,
  *      which also defuses decoy `charset=` strings deep in scripts);
  *   4. the UTF-8 default.
  *
  * Between the two meta forms (HTML5 `<meta charset>` vs HTML4
  * `http-equiv`), the EARLIER match in the prelude wins — document
  * order, not form priority. The detected name feeds [[decodeWith]],
  * which strips the BOM and decodes the body bytes; UTF-32 BOMs are out
  * of scope (extinct on the web; WHATWG dropped UTF-32 entirely).
  *
  * All pure codegen'd regexp/string Columns, map-side. Names are
  * lowercased (charset names are case-insensitive, RFC 2978 §2.3).
  */
object Charset {

  /** WHATWG prescan bound: meta declarations are honored only in the
    * first 1024 body bytes.
    */
  val preludeBytes = 1024

  private val headerCharset = "(?i)charset=\"?([A-Za-z0-9_][A-Za-z0-9._\\-]*)"

  /** HTML5 form. The attribute walk consumes preceding attributes WHOLE
    * (quoted values as single runs; the unquoted arm excludes quote
    * chars so backtracking can never re-enter a quoted value one char
    * at a time), so a decoy `charset=` inside a quoted attribute VALUE
    * — `content="all about charset=EBCDIC"` — can never match;
    * `charset` must be a top-level attribute name.
    */
  private val html5Pat =
    "(?i)<meta(?:\\s+[a-z0-9-]+(?:=(?:\"[^\"]*\"|'[^']*'|[^\\s>\"']*))?)*?" +
      "\\scharset\\s*=\\s*[\"']?([A-Za-z0-9_][A-Za-z0-9._\\-]*)"

  /** HTML4 form: `http-equiv="Content-Type"` with the charset in the
    * `content` value (the lookahead makes http-equiv/content attribute
    * ORDER irrelevant — both appear in the wild).
    */
  private val html4Pat =
    "(?i)<meta(?=[^>]*http-equiv=[\"']?content-type)[^>]*content=[\"'][^\"'>]*" +
      headerCharset.stripPrefix("(?i)")

  /** `charset` parameter of a Content-Type header value, or NULL. */
  def fromContentType(contentType: Column): Column =
    lower(nullif(regexp_extract(contentType, headerCharset, 1), lit("")))

  /** First meta declaration in the (already length-bounded) prelude
    * text, or NULL. Both forms are matched and the one whose match
    * starts EARLIER wins — a page carrying an HTML4 declaration before a
    * conflicting HTML5 one resolves to the HTML4 value, per document
    * order. Attribute-level regexes, same posture as `hrefs` — meta
    * tags can't nest, so no parser is needed.
    */
  def fromMeta(prelude: Column): Column = {
    val v5 = nullif(regexp_extract(prelude, html5Pat, 1), lit(""))
    val v4 = nullif(regexp_extract(prelude, html4Pat, 1), lit(""))
    val p5 = regexp_instr(prelude, lit(html5Pat))
    val p4 = regexp_instr(prelude, lit(html4Pat))
    lower(when(v5.isNotNull && (v4.isNull || p5 <= p4), v5).otherwise(v4))
  }

  /** BOM-declared charset of the body BYTES, or NULL. Checked on the
    * hex of the first 3 bytes — UTF-8's EF BB BF whole, UTF-16's FF FE /
    * FE FF as a 2-byte prefix (hex of a shorter body simply fails the
    * comparison; no length guard needed).
    */
  def fromBom(bodyBytes: Column): Column = {
    val h = hex(substring(bodyBytes, 1, 3))
    when(h === "EFBBBF", lit("utf-8"))
      .when(substring(h, 1, 4) === "FFFE", lit("utf-16le"))
      .when(substring(h, 1, 4) === "FEFF", lit("utf-16be"))
  }

  /** The resolved charset plus its provenance: (charset, source) where
    * source ∈ bom | header | meta | default. The meta prescan decodes
    * the prelude as ISO-8859-1 — byte-transparent, so ASCII markup is
    * readable whatever the page's true encoding (a UTF-16 body yields
    * NUL-interleaved text the meta regexes simply never match; its BOM
    * already decided).
    */
  def detect(contentType: Column, bodyBytes: Column): (Column, Column) = {
    val b = fromBom(bodyBytes)
    val h = fromContentType(contentType)
    val m = fromMeta(decode(substring(bodyBytes, 1, preludeBytes), "ISO-8859-1"))
    (coalesce(b, h, m, lit("utf-8")),
      when(b.isNotNull, lit("bom"))
        .when(h.isNotNull, lit("header"))
        .when(m.isNotNull, lit("meta"))
        .otherwise(lit("default")))
  }

  /** Decode body bytes through the detected charset name: the BOM (when
    * present) is stripped first, then the bytes decode through the
    * nearest JVM charset — the windows-125x family maps onto ISO-8859-1
    * (byte-compatible over the Latin-1 range; Spark's non-legacy
    * `decode` supports exactly the US-ASCII/ISO-8859-1/UTF-8/UTF-16
    * set), unknown/UTF-8 names take the UTF-8 arm. Each arm is a
    * literal-charset `decode` call, codegen'd.
    */
  def decodeWith(bodyBytes: Column, charset: Column): Column = {
    val bomLen =
      when(hex(substring(bodyBytes, 1, 3)) === "EFBBBF", 3)
        .when(substring(hex(substring(bodyBytes, 1, 2)), 1, 4).isin("FFFE", "FEFF"), 2)
        .otherwise(0)
    val b = substring(bodyBytes, bomLen + 1, length(bodyBytes))
    when(charset === "utf-16le", decode(b, "UTF-16LE"))
      .when(charset === "utf-16be", decode(b, "UTF-16BE"))
      .when(charset.isin("iso-8859-1", "latin-1", "latin1", "windows-1252",
        "cp1252", "windows-1250", "iso-8859-15", "us-ascii", "ascii",
        "iso-8859-5"), decode(b, "ISO-8859-1"))
      .otherwise(decode(b, "UTF-8"))
  }
}
