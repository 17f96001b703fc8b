package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Page charset detection — the WET-stage step between the HTTP split and
  * text extraction: real crawled HTML declares its encoding in the
  * Content-Type header's `charset` parameter, or (when the server lies or
  * says nothing) in a `<meta charset>` / `<meta http-equiv>` tag, or not
  * at all. The precedence implemented is the WHATWG/HTTP one a real
  * pipeline uses: header parameter wins, then the first in-document meta
  * declaration, then the UTF-8 default. Detection only — the archive
  * fixture is ASCII, so decoding itself stays byte-identity; on a real
  * corpus the detected name feeds `decode(payload, charset)`.
  *
  * All pure codegen'd regexp Columns, map-side. Names are lowercased
  * (charset names are case-insensitive, RFC 2978 §2.3).
  */
object Charset {

  private val headerCharset = "(?i)charset=\"?([A-Za-z0-9_][A-Za-z0-9._\\-]*)"

  /** `charset` parameter of a Content-Type header value, or NULL. */
  def fromContentType(contentType: Column): Column =
    lower(nullif(regexp_extract(contentType, headerCharset, 1), lit("")))

  /** First in-document meta declaration, or NULL: `<meta charset="x">`
    * (HTML5) or `<meta http-equiv="Content-Type" content="…charset=x">`
    * (HTML4; the lookahead makes the http-equiv/content attribute ORDER
    * irrelevant — both appear in the wild). Attribute-level regexes,
    * same posture as `hrefs` — meta tags can't nest, so no parser is
    * needed.
    */
  def fromMeta(body: Column): Column = {
    val html5 = nullif(regexp_extract(body,
      "(?i)<meta[^>]*\\scharset=[\"']?([A-Za-z0-9_][A-Za-z0-9._\\-]*)", 1), lit(""))
    val html4 = nullif(regexp_extract(body,
      "(?i)<meta(?=[^>]*http-equiv=[\"']?content-type)[^>]*content=[\"'][^\"'>]*" +
        headerCharset.stripPrefix("(?i)"), 1), lit(""))
    lower(coalesce(html5, html4))
  }

  /** The resolved charset plus its provenance: (charset, source) where
    * source ∈ header | meta | default.
    */
  def detect(contentType: Column, body: Column): (Column, Column) = {
    val h = fromContentType(contentType)
    val m = fromMeta(body)
    (coalesce(h, m, lit("utf-8")),
      when(h.isNotNull, lit("header"))
        .when(m.isNotNull, lit("meta"))
        .otherwise(lit("default")))
  }
}
