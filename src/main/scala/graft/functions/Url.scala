package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for crawl-scale dedup (beyond-reference: the
  * reference's URL handling is the DOI `fix_url` percent-repair,
  * `/root/reference/synth/doi.py:96-104` — it never needs to EQUATE
  * urls; a web-corpus pipeline dedups by canonical URL before it ever
  * hashes page bytes).
  *
  * Pure `Column` composition over `try_parse_url` — stays inside
  * whole-stage codegen, map-side, no UDF. The equivalence classes it
  * erases:
  *
  *  - scheme and authority case (`HTTPS://D1.EX.TEST` → `https://d1.ex.test`)
  *  - the scheme's default port (`:443` on https, `:80` on http);
  *    non-default ports are significant and survive
  *  - the fragment (never reaches the server)
  *  - tracking parameters (`utm_*`, `fbclid`, `gclid`)
  *  - query-parameter order (`b=2&a=1` → `a=1&b=2`) and a bare
  *    trailing `?`
  *  - an empty path (`https://h.test` → `https://h.test/`)
  *
  * Deliberately NOT erased: userinfo, dot-segments (`/a/../b`), and
  * percent-encoding case — all rare enough in crawl data that erasing
  * them buys little recall for real aliasing risk. An unparseable URL
  * canonicalizes to NULL (try_parse_url's posture), so malformed rows drop
  * out of URL-keyed groups instead of colliding on an error token.
  */
object Url {

  private val trackingPrefixes = Seq("utm_", "fbclid=", "gclid=")

  /** RFC 3986 §5.2.4 remove_dot_segments over an ABSOLUTE path column —
    * one `aggregate` fold over the split segments (codegen'd higher-order
    * function, map-side): `.` drops, `..` pops (never above root, §5.2.4's
    * "/.." → "/" rule), empty segments from `//` runs and a trailing `/`
    * ride through the fold unchanged, and a FINAL `.`/`..` leaves the
    * directory's trailing slash exactly as the RFC's algorithm does.
    */
  private[functions] def removeDotSegments(path: Column): Column = {
    // segments after the leading '/' — "/a/b/" → ["a","b",""]
    val raw = split(substring(path, 2, Int.MaxValue), "/", -1)
    val folded = aggregate(raw, array().cast("array<string>"),
      (acc, x) =>
        when(x === ".", acc)
          .when(x === "..", slice(acc, lit(1), greatest(size(acc) - 1, lit(0))))
          .otherwise(concat(acc, array(x))))
    val dirTail = element_at(raw, -1).isin(".", "..")
    concat(lit("/"), array_join(
      when(dirTail, concat(folded, array(lit("")))).otherwise(folded), "/"))
  }

  /** RFC 3986 §5 reference resolution as a pure Column — the missing
    * half of link extraction on real archived HTML, where most anchors
    * are RELATIVE (`/d/5`, `../x`, `?q=1`, `//host/p`). Returns the
    * ABSOLUTE url string (feed it to [[canonicalizeUrl]]); an absolute
    * `ref` passes through verbatim, so wiring this in front of an
    * absolute-only pipeline is behavior-preserving. The §5.2.2 branch
    * table, in order: a ref with a scheme is already absolute;
    * `//authority…` keeps only the base scheme; `/path…` keeps
    * scheme+authority; `?query`/`#frag`-only refs keep the base path
    * (and, for `#`, the base query — the fragment is dropped later by
    * canonicalization); anything else merges onto the base path's
    * directory (§5.2.3) — both path branches through
    * [[removeDotSegments]]. An unparseable base null-propagates through
    * `concat` to NULL, the same drop-out posture as canonicalization.
    */
  def resolveUrl(base: Column, ref: Column): Column = {
    val scheme = lower(try_parse_url(base, lit("PROTOCOL")))
    val auth = try_parse_url(base, lit("AUTHORITY"))
    val basePath =
      coalesce(nullif(try_parse_url(base, lit("PATH")), lit("")), lit("/"))
    val baseQs = try_parse_url(base, lit("QUERY"))
    val prefix = concat(scheme, lit("://"), auth)
    val baseWithQs = concat(prefix, basePath,
      coalesce(concat(lit("?"), baseQs), lit("")))
    // the ref's path stops at the first ? or # — dot-segment removal
    // applies to the PATH only, the tail rides along untouched
    val refPath = regexp_extract(ref, "^[^?#]*", 0)
    val refTail = substring(ref, length(refPath) + 1, lit(Int.MaxValue))
    val baseDir = regexp_replace(basePath, "[^/]*$", "")
    when(ref.isNull || auth.isNull, lit(null).cast("string"))
      .when(ref.rlike("^[A-Za-z][A-Za-z0-9+.\\-]*:"), ref)
      .when(ref.startsWith("//"), concat(scheme, lit(":"), ref))
      .when(ref.startsWith("/"),
        concat(prefix, removeDotSegments(refPath), refTail))
      .when(ref === "" || ref.startsWith("#"), baseWithQs)
      .when(ref.startsWith("?"), concat(prefix, basePath, ref))
      .otherwise(concat(prefix,
        removeDotSegments(concat(baseDir, refPath)), refTail))
  }

  def canonicalizeUrl(u: Column): Column = {
    val scheme = lower(try_parse_url(u, lit("PROTOCOL")))
    val auth = lower(try_parse_url(u, lit("AUTHORITY")))
    val authNoDefault =
      when(scheme === "https", regexp_replace(auth, ":443$", ""))
        .when(scheme === "http", regexp_replace(auth, ":80$", ""))
        .otherwise(auth)
    val path = try_parse_url(u, lit("PATH"))
    val normPath = when(path.isNull || path === "", lit("/")).otherwise(path)
    val params = array_sort(filter(split(try_parse_url(u, lit("QUERY")), "&"),
      p => !trackingPrefixes.map(t => p.startsWith(t)).reduce(_ || _) && p =!= ""))
    val qs = when(params.isNotNull && size(params) > 0,
      concat(lit("?"), array_join(params, "&"))).otherwise(lit(""))
    // concat null-propagates: unparseable url (null scheme/authority) -> null
    concat(scheme, lit("://"), authNoDefault, normPath, qs)
  }
}
