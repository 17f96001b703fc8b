package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** robots.txt policy evaluation for crawl pipelines (beyond-reference —
  * the reference fetches API endpoints, never crawls; a web pipeline must
  * gate fetches per host policy before any URL reaches the frontier).
  *
  * Two tiers:
  *  - [[disallowPrefixes]] + [[isBlocked]]: the bulk-processing PREFIX
  *    subset — what blanket corpus jobs enforce when policies are known
  *    to be plain prefix lists. Fastest: `startswith` per (path, prefix).
  *  - [[rules]] / [[rulesFor]] + [[isBlockedByRules]]: RFC 9309 rule
  *    evaluation — `Allow` carve-outs, `*` wildcards, trailing-`$`
  *    anchors, longest-match precedence with Allow winning length ties,
  *    GROUP MERGING for stacked `User-agent` lines (§2.1: adjacent
  *    start-group lines share the following rule block), and per-bot
  *    group selection with fall-back-to-`*` (§2.2.1: a crawler picks the
  *    groups matching its own product token; only when none match do the
  *    `*` groups apply).
  *
  * Deliberately out of scope — percent-encoding normalization of
  * patterns vs paths (both sides are assumed already canonicalized,
  * [[Url.canonicalizeUrl]]'s job) and prefix-matching of agent tokens
  * (RFC 9309 token matching is exact; the Google-style
  * `googlebot-images` ⊃ `googlebot` longest-prefix extension is not
  * implemented) — documented so the gate is never mistaken for a
  * complete RFC 9309 evaluator.
  *
  * Pure `Column` composition (split / filter / transform / flatten with
  * regexp inside the lambdas — all codegen'd, no UDF), so the parse runs
  * map-side over a (host, robots_txt) policy table and the result
  * broadcasts into the page gate. The rules tier compiles its pattern
  * regexes per evaluation (non-foldable `rlike`) — fine for a
  * policy-table-sized broadcast gate, which is why the prefix tier stays
  * the default for blanket jobs.
  */
object Robots {

  /** All agent segments of a robots.txt as
    * `array<struct<token, body>>`, with RFC 9309 §2.1 group merging
    * applied: a segment carrying NO group directives (no
    * Disallow/Allow/Crawl-delay lines of its own — stacked `User-agent`
    * lines, or adjacent start-group lines separated only by blanks,
    * comments, or non-group fields like `Sitemap:`) shares the next
    * directive-bearing segment's body, so `User-agent: *` followed by
    * `User-agent: somebot` and a rule block assigns the block to BOTH
    * agents instead of silently dropping the `*` group's rules.
    * Parsing notes:
    *  - split on case-insensitive `User-agent:`; the pre-split preamble
    *    (index 0) carries no agent and is dropped;
    *  - tokens lowercase for the case-insensitive match of [[groupsFor]];
    *  - CRLF files work unchanged (`\r` is whitespace to `\\s`).
    */
  private def agentSegments(robotsTxt: Column): Column = {
    val tagged = transform(
      split(robotsTxt, "(?i)user-agent:"),
      (g, i) => struct(
        lower(regexp_extract(ltrim(g), "^(\\S+)", 1)).as("token"),
        g.as("body"),
        g.rlike("(?mi)^[ \\t]*(disallow|allow|crawl-delay):").as("own"),
        i.as("idx")))
    val segs = filter(tagged, s => s.getField("idx") > 0)
    transform(segs, s => struct(
      s.getField("token").as("token"),
      when(s.getField("own"), s.getField("body"))
        .otherwise(coalesce(
          get(filter(segs, t =>
            t.getField("idx") > s.getField("idx") && t.getField("own")), lit(0))
            .getField("body"),
          lit(""))).as("body")))
  }

  /** The group bodies a crawler with product token `agent` must obey
    * (RFC 9309 §2.2.1): the segments whose token matches the agent
    * case-insensitively and EXACTLY when any exist, otherwise the `*`
    * segments — so a bot-specific group like `User-agent: *bot` never
    * leaks into the bulk (`*`) policy, and a named bot only falls back
    * to `*` on hosts that declare no group for it. Multiple matching
    * groups combine, per the RFC.
    */
  private def groupsFor(robotsTxt: Column, agent: Column): Column = {
    val all = agentSegments(robotsTxt)
    val tok = lower(agent)
    val exact = filter(all, s => s.getField("token") === tok)
    transform(when(size(exact) > 0, exact)
        .otherwise(filter(all, s => s.getField("token") === lit("*"))),
      s => s.getField("body"))
  }

  private def starGroups(robotsTxt: Column): Column =
    groupsFor(robotsTxt, lit("*"))

  /** The `*` group's Disallow prefixes as a deduped array — the PREFIX
    * subset. Parsing notes:
    *  - `Disallow:` matched per line, case-insensitively, with HORIZONTAL
    *    whitespace only after the colon — an empty `Disallow:` line (the
    *    allow-everything idiom) must not swallow the next line across the
    *    newline;
    *  - leading horizontal whitespace before the directive is tolerated
    *    (RFC 9309's ABNF allows `*WS` before a line's identifier), and
    *    MUST stay in lockstep with [[agentSegments]]' own-directive check
    *    — an indented group classed directive-bearing there but yielding
    *    zero rules here would silently suppress §2.1 inheritance;
    *  - non-directive lines (`Allow`, `Crawl-delay`, comments) fall out
    *    naturally.
    */
  def disallowPrefixes(robotsTxt: Column): Column =
    array_distinct(flatten(transform(starGroups(robotsTxt),
      g => regexp_extract_all(g, lit("(?mi)^[ \\t]*disallow:[ \\t]*(\\S+)"), lit(1)))))

  /** TRUE when `path` is blocked by any of `prefixes` (prefix match, the
    * subset contract above). NULL-safe: a host with no policy row (null
    * array) or a null path gates to false — crawl-side convention is
    * allow-on-missing-policy; flip with a filter if a deployment wants
    * block-on-missing.
    */
  def isBlocked(path: Column, prefixes: Column): Column =
    coalesce(exists(prefixes, p => startswith(path, p)), lit(false))

  /** The `*` group's FULL rule set as a deduped
    * `array<struct<pattern, allow>>` — both `Disallow` and `Allow` lines,
    * for longest-match evaluation by [[isBlockedByRules]]. Empty-valued
    * directives drop out (an empty `Disallow:` is the allow-everything
    * idiom; an empty `Allow:` matches nothing a longer rule wouldn't
    * already decide).
    */
  def rules(robotsTxt: Column): Column =
    rulesOver(starGroups(robotsTxt))

  /** [[rules]] for a crawler evaluating its OWN product token: the rule
    * set of the groups [[groupsFor]] selects (exact token match when any
    * group names the agent, the `*` groups otherwise). Same struct
    * shape, same [[isBlockedByRules]] evaluation.
    */
  def rulesFor(robotsTxt: Column, agent: Column): Column =
    rulesOver(groupsFor(robotsTxt, agent))

  private def rulesOver(gs: Column): Column = {
    // leading-whitespace tolerance matches agentSegments' own-directive
    // check — the two classifications must agree (see disallowPrefixes)
    def lines(directive: String, allow: Boolean) =
      (g: Column) => transform(
        regexp_extract_all(g, lit(s"(?mi)^[ \\t]*$directive:[ \\t]*(\\S+)"), lit(1)),
        p => struct(p.as("pattern"), lit(allow).as("allow")))
    array_distinct(concat(
      flatten(transform(gs, lines("disallow", allow = false))),
      flatten(transform(gs, lines("allow", allow = true)))))
  }

  /** The `*` group's `Crawl-delay` in seconds (null when absent) — the
    * per-host pacing input a politeness scheduler divides its budget by.
    * GROUP-SCOPED like the rules (a bot-specific group's delay must not
    * leak), and when multiple `*` groups declare one, the MAXIMUM wins —
    * the conservative reading a polite crawler takes of a contradictory
    * file.
    */
  def crawlDelaySeconds(robotsTxt: Column): Column =
    delayOver(starGroups(robotsTxt))

  /** [[crawlDelaySeconds]] under the same per-bot group selection as
    * [[rulesFor]] — a named bot paces by ITS group's delay, falling back
    * to the `*` groups' only where no group names it.
    */
  def crawlDelaySecondsFor(robotsTxt: Column, agent: Column): Column =
    delayOver(groupsFor(robotsTxt, agent))

  private def delayOver(gs: Column): Column =
    array_max(transform(
      flatten(transform(gs,
        g => regexp_extract_all(g,
          lit("(?mi)^[ \\t]*crawl-delay:[ \\t]*([0-9.]+)"), lit(1)))),
      v => v.cast("double")))

  /** `Sitemap:` URLs as a deduped array. Unlike the rule directives,
    * sitemap lines are GROUP-INDEPENDENT (RFC 9309 §2.3: "not part of
    * any group") — a sitemap declared inside some bot-specific group
    * still counts, so this scans the whole file, not [[starGroups]].
    * Values are full URLs (`\S+`, no path-pattern semantics).
    */
  def sitemaps(robotsTxt: Column): Column =
    array_distinct(regexp_extract_all(robotsTxt,
      lit("(?mi)^[ \\t]*sitemap:[ \\t]*(\\S+)"), lit(1)))

  /** The five predefined XML entities decoded (sitemaps.org requires
    * escaping them in `<loc>`/`<lastmod>` text — a real-world loc with a
    * query string arrives as `...?a=1&amp;b=2` and must fold onto its
    * canonical discovered form, or every such page becomes a spurious
    * frontier seed). `&amp;` decodes LAST so `&amp;lt;` yields the
    * literal `&lt;`, not `<`. Numeric character references are out of
    * scope with the rest of the no-XML-library posture.
    */
  private def xmlUnescape(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(c, "&lt;", "<"),
            "&gt;", ">"),
          "&quot;", "\""),
        "&apos;", "'"),
      "&amp;", "&")

  /** `<loc>` values of a fetched sitemap document — the CONSUMPTION leg
    * of sitemap discovery ([[sitemaps]] finds the sitemap URLs; this
    * turns the XML they point at into frontier seed URLs). Works for
    * both `<urlset>` page lists and `<sitemapindex>` nesting (a `<loc>`
    * is a URL either way — the caller decides whether to enqueue or
    * re-fetch), tolerates whitespace/newline padding inside the element,
    * dedupes, and ignores every sibling element (`lastmod`, `priority`,
    * ...). Same pure-regexp map-side posture as the policy parse: no XML
    * library, one codegen'd `regexp_extract_all` per document.
    */
  def sitemapLocs(xml: Column): Column =
    array_distinct(transform(
      regexp_extract_all(xml,
        lit("(?is)<loc>\\s*([^<]*?)\\s*</loc>"), lit(1)),
      l => xmlUnescape(l)))

  /** `<loc>` + `<lastmod>` pairs of a fetched sitemap as
    * `array<struct<loc, lastmod>>` — [[sitemapLocs]] plus the ONE
    * freshness signal the sitemap protocol exists to provide, feeding
    * staleness-weighted refresh scheduling (lastmod after the last fetch
    * ⇒ the page needs a re-crawl). Pairing is per `<url>`/`<sitemap>`
    * element block so a lastmod can never attach to a neighboring loc;
    * a block without lastmod carries null; whitespace padding and XML
    * entities fold the same as [[sitemapLocs]]. Deduped on the pair.
    */
  def sitemapEntries(xml: Column): Column =
    array_distinct(transform(
      filter(
        regexp_extract_all(xml,
          lit("(?is)<(?:url|sitemap)>(.*?)</(?:url|sitemap)>"), lit(1)),
        b => regexp_like(b, lit("(?is)<loc>"))),
      b => struct(
        xmlUnescape(regexp_extract(b, "(?is)<loc>\\s*([^<]*?)\\s*</loc>", 1))
          .as("loc"),
        nullif(xmlUnescape(regexp_extract(b,
          "(?is)<lastmod>\\s*([^<]*?)\\s*</lastmod>", 1)), lit(""))
          .as("lastmod"))))

  /** One robots path pattern as an equivalent Java regex: `*` matches any
    * run of characters, a TRAILING `$` anchors the match at path end, and
    * every other character is literal (non-trailing `$` included). The
    * implied prefix anchor is `^`; an unanchored pattern matches any
    * continuation, which is exactly the prefix semantics of the plain
    * tier.
    */
  private def patternRegex(p: Column): Column = {
    val anchored = endswith(p, lit("$"))
    val core = when(anchored, p.substr(lit(1), length(p) - 1)).otherwise(p)
    // escape regex metacharacters EXCEPT `*` (rewritten below); `$` here
    // is a non-trailing literal
    val esc = regexp_replace(core, "([\\\\.\\[\\]{}()+?^$|])", "\\\\$1")
    concat(lit("^"), regexp_replace(esc, "\\*", ".*"),
      when(anchored, lit("$")).otherwise(lit("")))
  }

  /** The robots-FETCH-status tier of the gate (RFC 9309 §2.3.1): the
    * verdict for a path given how the robots.txt fetch itself ended —
    * 2xx evaluates the parsed rules as usual; 3xx is what a crawler sees
    * AFTER following redirects, so an unresolved 3xx here falls into the
    * unreachable class conservatively alongside 5xx ("MUST assume
    * complete disallow"); 4xx means "unavailable" and the RFC says a
    * crawler MAY access all resources (the universal convention);
    * anything else (timeouts modeled as null, 5xx) blocks everything.
    * This is the gate production crawlers actually run — a host whose
    * robots.txt 503s must NOT be crawled as if it had no policy.
    */
  def isBlockedWithFetchStatus(status: Column, path: Column,
      rules: Column): Column =
    when(status >= 200 && status < 300, isBlockedByRules(path, rules))
      .when(status >= 400 && status < 500, lit(false))
      .otherwise(lit(true))

  /** TRUE when `path` is blocked under RFC 9309 precedence: among the
    * rules whose pattern matches, the LONGEST pattern wins, and a length
    * tie goes to `Allow`. No matching rule — or no policy row, or a null
    * path — gates to false (the same allow-on-missing convention as
    * [[isBlocked]]).
    */
  def isBlockedByRules(path: Column, rules: Column): Column = {
    val matching = filter(rules,
      r => regexp_like(path, patternRegex(r.getField("pattern"))))
    // max over (len, allow) structs = longest match, Allow winning ties
    val top = array_max(transform(matching,
      r => struct(length(r.getField("pattern")).as("len"),
        r.getField("allow").cast("int").as("a"))))
    coalesce(top.getField("a") === 0, lit(false))
  }
}
