package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

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

  /** RFC 3986 §5 reference resolution — the missing half of link
    * extraction on real archived HTML, where most anchors are RELATIVE
    * (`/d/5`, `../x`, `?q=1`, `//host/p`). Returns the ABSOLUTE url
    * string (feed it to [[canonicalizeUrl]]); an absolute `ref` passes
    * through verbatim, so wiring this in front of an absolute-only
    * pipeline is behavior-preserving. The §5.2.2 branch table, in order:
    * a ref with a scheme is already absolute; `//authority…` keeps only
    * the base scheme; `/path…` keeps scheme+authority; `?query`/
    * `#frag`-only refs keep the base path (and, for `#`, the base
    * query — the fragment is dropped later by canonicalization);
    * anything else merges onto the base path's directory (§5.2.3) —
    * both path branches through dot-segment removal (§5.2.4). An
    * unparseable base resolves to NULL, the same drop-out posture as
    * canonicalization.
    *
    * NATIVE codegen expression ([[ResolveUrl]] → `UrlResolve.resolve`),
    * not a Column composition: the first wiring of this as ~10 chained
    * `try_parse_url`/regexp Columns plus an interpreted higher-order
    * `aggregate` fold for dot segments took the whole link-extraction
    * projection out of whole-stage codegen and cost the `warcLinkEdges`
    * consumers 5-10× (warc_links 0.52 → 5.8 s at sf0.1; the COVERAGE
    * "HOFs are interpreted" note, relearned). The retired Column form
    * survives as [[resolveUrlColumns]] solely so UrlSpec can pin the
    * native expression's exact equivalence on every planted href class.
    */
  def resolveUrl(base: Column, ref: Column): Column =
    ColumnBridge.column(
      ResolveUrl(ColumnBridge.expr(base), ColumnBridge.expr(ref)))

  /** The original pure-Column form of [[resolveUrl]] — equivalence
    * reference for the spec, not for production plans (interpreted HOF).
    */
  private[functions] def resolveUrlColumns(base: Column, ref: Column): Column = {
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

  /** SURT (Sort-friendly URI Reordering Transform) key of an ALREADY
    * CANONICAL url ([[canonicalizeUrl]] output) — the CDX capture-index
    * primary key convention (Internet Archive / OpenWayback / Common
    * Crawl's cdxj): host labels reversed and comma-joined, a `)`
    * delimiter, then path + query, scheme erased. `www.` is dropped
    * (the "massaged" form) so `www.ex.test` and `ex.test` captures
    * interleave. The point of the transform is LOCALITY: every page of
    * a host — and every host of a domain — sorts contiguously, so
    * "everything under `test,ex`" is one range scan over a sorted
    * index instead of a full-index suffix match. Pure codegen'd
    * regexp/array Columns; null-propagates on a null canonical.
    */
  def surt(canonical: Column): Column = {
    val auth = regexp_extract(canonical, "^[a-z][a-z0-9+.\\-]*://([^/?#]*)", 1)
    // canonicalizeUrl keeps only NON-default ports; they ride behind the
    // reversed host so the same host's ports stay adjacent
    val host = regexp_replace(auth, ":\\d+$", "")
    val port = regexp_extract(auth, "(:\\d+)$", 1)
    val tail = regexp_replace(canonical, "^[a-z][a-z0-9+.\\-]*://[^/?#]*", "")
    val noWww = regexp_replace(host, "^www\\.", "")
    when(canonical.isNull, lit(null).cast("string"))
      .otherwise(concat(
        array_join(reverse(split(noWww, "\\.")), ","), port, lit(")"), tail))
  }
}

/** JVM kernel for RFC 3986 §5 reference resolution — one static call per
  * row inside whole-stage codegen (the [[HtmlText]]/`PorterStem`
  * pattern). Semantics are EXACTLY [[Url.resolveUrlColumns]]'s, including
  * its quirks: base parsing via `java.net.URI` (what Spark's
  * `try_parse_url` uses — unparseable → null), only the scheme
  * lowercased, empty segments riding through dot-segment removal, and a
  * final `.`/`..` leaving the directory's trailing slash.
  */
object UrlResolve {

  /** §5.2.4 over an absolute path, mirroring the Column fold: segments
    * after the leading `/`; `.` drops, `..` pops (never above root),
    * empty segments from `//` runs ride through, a final `.`/`..` keeps
    * the trailing slash.
    */
  private[functions] def removeDotSegments(path: String): String = {
    if (path.isEmpty) return "/"
    val raw = path.substring(1).split("/", -1)
    val acc = new java.util.ArrayList[String](raw.length)
    var i = 0
    while (i < raw.length) {
      raw(i) match {
        case "." => ()
        case ".." => if (!acc.isEmpty) acc.remove(acc.size - 1)
        case s => acc.add(s)
      }
      i += 1
    }
    val last = raw(raw.length - 1)
    if (last == "." || last == "..") acc.add("")
    val sb = new java.lang.StringBuilder(path.length)
    i = 0
    while (i < acc.size) { sb.append('/').append(acc.get(i)); i += 1 }
    if (acc.isEmpty) "/" else sb.toString
  }

  /** True iff `ref` opens with a scheme (`^[A-Za-z][A-Za-z0-9+.\-]*:`).
    * ASCII ranges only — RFC 3986 §3.1 scheme chars are ASCII, and the
    * retired Column form's regex test is ASCII-only; `Character.isLetter`
    * would accept Unicode letters here and let a ref like `é:x` pass
    * through verbatim natively while the Column form resolves it as
    * relative, breaking the documented exact-equivalence contract.
    */
  private def asciiAlpha(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')

  private def hasScheme(ref: String): Boolean = {
    if (ref.isEmpty || !asciiAlpha(ref.charAt(0))) return false
    var i = 1
    while (i < ref.length) {
      val c = ref.charAt(i)
      if (c == ':') return true
      if (!asciiAlpha(c) && !(c >= '0' && c <= '9') && c != '+' && c != '.' && c != '-')
        return false
      i += 1
    }
    false
  }

  def resolve(base: String, ref: String): String = {
    if (base == null || ref == null) return null
    val uri =
      try new java.net.URI(base)
      catch { case _: java.net.URISyntaxException => return null }
    val scheme0 = uri.getScheme
    val auth = uri.getRawAuthority
    if (scheme0 == null || auth == null) return null
    val scheme = scheme0.toLowerCase(java.util.Locale.ROOT)
    val rawPath = uri.getRawPath
    val basePath = if (rawPath == null || rawPath.isEmpty) "/" else rawPath
    val baseQs = uri.getRawQuery
    val prefix = scheme + "://" + auth
    if (hasScheme(ref)) return ref
    if (ref.startsWith("//")) return scheme + ":" + ref
    // the ref's path stops at the first ? or # — dot-segment removal
    // applies to the PATH only, the tail rides along untouched
    var cut = ref.length
    var i = 0
    while (i < ref.length && cut == ref.length) {
      val c = ref.charAt(i)
      if (c == '?' || c == '#') cut = i
      i += 1
    }
    val refPath = ref.substring(0, cut)
    val refTail = ref.substring(cut)
    if (ref.startsWith("/"))
      return prefix + removeDotSegments(refPath) + refTail
    if (ref.isEmpty || ref.startsWith("#"))
      return prefix + basePath + (if (baseQs != null) "?" + baseQs else "")
    if (ref.startsWith("?")) return prefix + basePath + ref
    val baseDir = basePath.substring(0, basePath.lastIndexOf('/') + 1)
    prefix + removeDotSegments(baseDir + refPath) + refTail
  }

  def resolveUTF8(base: UTF8String, ref: UTF8String): UTF8String = {
    val s = resolve(base.toString, ref.toString)
    if (s == null) null else UTF8String.fromString(s)
  }
}

/** `resolve_url(base, ref)` as a codegen'd Catalyst expression: children
  * null-propagate, an unparseable base yields NULL (hence the explicit
  * isNull re-check around the kernel call).
  */
case class ResolveUrl(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "resolve_url"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ResolveUrl =
    copy(left = newLeft, right = newRight)

  override protected def nullSafeEval(base: Any, ref: Any): Any =
    UrlResolve.resolveUTF8(
      base.asInstanceOf[UTF8String], ref.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, r) => {
      s"""
         |${ev.value} = graft.functions.UrlResolve.resolveUTF8($b, $r);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
}
