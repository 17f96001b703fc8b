package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** robots.txt policy evaluation for crawl pipelines (beyond-reference —
  * the reference fetches API endpoints, never crawls; a web pipeline must
  * gate fetches per host policy before any URL reaches the frontier).
  *
  * Scope is the bulk-processing subset: the `User-agent: *` group's
  * `Disallow` path prefixes. Deliberately out of scope — per-bot group
  * matching, `Allow` precedence, `$`/`*` wildcards — documented here so
  * the gate is never mistaken for an RFC 9309 evaluator; the prefix
  * subset is what blanket corpus jobs actually enforce.
  *
  * Pure `Column` composition (split / filter / transform / flatten with
  * regexp inside the lambdas — all codegen'd, no UDF), so the parse runs
  * map-side over a (host, robots_txt) policy table and the result
  * broadcasts into the page gate.
  */
object Robots {

  /** The `*` group's Disallow prefixes as a deduped array. Parsing notes:
    *  - groups split on case-insensitive `User-agent:`; only segments
    *    whose agent token is `*` contribute (a bot-specific `Disallow: /`
    *    must not leak into the bulk policy);
    *  - `Disallow:` matched per line, case-insensitively, with HORIZONTAL
    *    whitespace only after the colon — an empty `Disallow:` line (the
    *    allow-everything idiom) must not swallow the next line across the
    *    newline;
    *  - CRLF files work unchanged (`\r` is neither matched by `[ \t]*`
    *    after the colon nor captured by `\S+`);
    *  - non-directive lines (`Crawl-delay`, comments) fall out naturally.
    */
  def disallowPrefixes(robotsTxt: Column): Column = {
    val groups = split(robotsTxt, "(?i)user-agent:")
    val starGroups = filter(groups, g => ltrim(g).startsWith("*"))
    val prefixLists = transform(starGroups,
      g => regexp_extract_all(g, lit("(?mi)^disallow:[ \\t]*(\\S+)"), lit(1)))
    array_distinct(flatten(prefixLists))
  }

  /** TRUE when `path` is blocked by any of `prefixes` (prefix match, the
    * subset contract above). NULL-safe: a host with no policy row (null
    * array) or a null path gates to false — crawl-side convention is
    * allow-on-missing-policy; flip with a filter if a deployment wants
    * block-on-missing.
    */
  def isBlocked(path: Column, prefixes: Column): Column =
    coalesce(exists(prefixes, p => startswith(path, p)), lit(false))
}
