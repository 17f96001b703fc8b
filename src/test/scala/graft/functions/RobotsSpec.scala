package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Robots.disallowPrefixes / isBlocked — group scoping, the empty-
  * Disallow idiom, case and CRLF tolerance, and the prefix gate.
  */
class RobotsSpec extends SparkSpec {

  import spark.implicits._

  private def prefixes(txt: String): Seq[String] =
    Seq(txt).toDF("t")
      .select(Robots.disallowPrefixes(col("t")).as("p"))
      .collect().head.getSeq[String](0)

  test("only the * group's Disallow lines contribute") {
    val txt = "User-agent: fetchbot\nDisallow: /\n\n" +
      "User-agent: *\nDisallow: /private\nCrawl-delay: 2\n" +
      "User-agent: other\nDisallow: /other\n"
    assert(prefixes(txt) === Seq("/private"))
  }

  test("empty Disallow (allow-everything) must not swallow the next line") {
    val txt = "User-agent: *\nDisallow:\nCrawl-delay: 2\n"
    assert(prefixes(txt) === Seq.empty)
  }

  test("case-insensitive directives, CRLF files, multiple * groups, dedup") {
    val txt = "USER-AGENT: *\r\nDISALLOW: /a\r\n\r\n" +
      "user-agent: *\r\ndisallow: /b\r\ndisallow: /a\r\n"
    assert(prefixes(txt).sorted === Seq("/a", "/b"))
  }

  test("no * group -> no prefixes") {
    assert(prefixes("User-agent: fetchbot\nDisallow: /\n") === Seq.empty)
  }

  test("isBlocked: prefix match, null-safe on missing policy and path") {
    val rows = Seq(
      ("/private/x", Some(Seq("/private", "/tmp")), true),
      ("/public", Some(Seq("/private")), false),
      ("/priv", Some(Seq("/private")), false), // prefix of the PREFIX is not a match
      ("/anything", None, false))              // no policy row -> allow
    val got = rows.map(_._1).zip(rows.map(_._2))
      .toDF("path", "prefixes")
      .select(Robots.isBlocked(col("path"), col("prefixes")).as("b"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(got === rows.map(_._3))
    // null path gates to false instead of throwing
    val nullPath = Seq(Some(Seq("/a"))).toDF("prefixes")
      .select(Robots.isBlocked(lit(null).cast("string"), col("prefixes")))
      .collect().head.getBoolean(0)
    assert(!nullPath)
  }

  test("agent token must be EXACTLY '*': a '*bot' group never leaks") {
    val txt = "User-agent: *bot\nDisallow: /\n\n" +
      "User-agent: *\nDisallow: /private\n"
    assert(prefixes(txt) === Seq("/private"))
    // and '*' at end-of-text still counts as the bulk group
    assert(prefixes("User-agent: *") === Seq.empty)
    assert(prefixes("User-agent: *\nDisallow: /x") === Seq("/x"))
  }

  private def blocked(txt: String, path: String): Boolean =
    Seq((txt, path)).toDF("t", "path")
      .select(Robots.isBlockedByRules(col("path"), Robots.rules(col("t"))).as("b"))
      .collect().head.getBoolean(0)

  test("rules: Allow carve-out wins over a shorter Disallow (longest match)") {
    val txt = "User-agent: *\nDisallow: /shop\nAllow: /shop/sale\n"
    assert(blocked(txt, "/shop/cart"))
    assert(!blocked(txt, "/shop/sale/item1")) // carve-out, longer Allow
    assert(!blocked(txt, "/blog"))            // no matching rule
  }

  test("rules: length tie between Allow and Disallow goes to Allow") {
    val txt = "User-agent: *\nDisallow: /p/ab\nAllow: /p/cd\nAllow: /p/ab\n"
    assert(!blocked(txt, "/p/ab/x"))
  }

  test("rules: '*' wildcard and trailing-'$' anchor") {
    val txt = "User-agent: *\nDisallow: /*.pdf$\nDisallow: /tmp*/x\n"
    assert(blocked(txt, "/docs/a.pdf"))
    assert(!blocked(txt, "/docs/a.pdf.html")) // $ anchors the match
    assert(blocked(txt, "/tmp123/x"))
    assert(blocked(txt, "/tmp/x")) // '*' matches the empty run
    assert(!blocked(txt, "/tmp123/y"))
    // regex metacharacters in patterns stay literal
    val meta = "User-agent: *\nDisallow: /a+b(c)\n"
    assert(blocked(meta, "/a+b(c)/d"))
    assert(!blocked(meta, "/aab_c_")) // would match if + ( ) leaked as regex
  }

  test("sitemaps: group-independent (surface from inside a bot group), " +
      "deduped, never confused with rules") {
    val txt = "User-agent: fetchbot\nDisallow: /\n" +
      "Sitemap: https://a.test/sm1.xml\n\n" +
      "User-agent: *\nDisallow: /x\n" +
      "SITEMAP: https://a.test/sm2.xml\nSitemap: https://a.test/sm1.xml\n"
    val got = Seq(txt).toDF("t")
      .select(Robots.sitemaps(col("t")).as("s"))
      .collect().head.getSeq[String](0)
    assert(got.sorted === Seq("https://a.test/sm1.xml", "https://a.test/sm2.xml"))
    // and the decoy group's rules still don't leak
    assert(prefixes(txt) === Seq("/x"))
  }

  test("crawl delay: group-scoped (a bot group's delay never leaks), " +
      "max of contradictory * groups, null when absent") {
    def delay(txt: String): Option[Double] = {
      val r = Seq(txt).toDF("t")
        .select(Robots.crawlDelaySeconds(col("t")).as("d")).collect().head
      if (r.isNullAt(0)) None else Some(r.getDouble(0))
    }
    assert(delay("User-agent: fetchbot\nCrawl-delay: 99\n\n" +
      "User-agent: *\nCrawl-delay: 2\n") === Some(2.0))
    assert(delay("User-agent: *\nCrawl-delay: 1.5\n\n" +
      "User-agent: *\nCrawl-delay: 3\n") === Some(3.0))
    assert(delay("User-agent: *\nDisallow: /x\n") === None)
    assert(delay("User-agent: fetchbot\nCrawl-delay: 99\n") === None)
  }

  test("stacked User-agent lines share the following rule block " +
      "(RFC 9309 §2.1) — the '*' group's rules must not vanish") {
    // the r13 failure mode: '*' first, a named agent second, one block
    val txt = "User-agent: *\nUser-agent: somebot\nDisallow: /x\n"
    assert(prefixes(txt) === Seq("/x"))
    assert(blocked(txt, "/x/page"))
    // named agent first, '*' second — same block both ways
    assert(prefixes("User-agent: somebot\nUser-agent: *\nDisallow: /y\n")
      === Seq("/y"))
    // a three-deep stack, blanks between the start-group lines
    assert(prefixes("User-agent: a\n\nUser-agent: *\n\nUser-agent: b\n" +
      "Disallow: /z\n") === Seq("/z"))
    // a stacked '*' line must NOT inherit PAST a directive-bearing group
    // into a later unrelated one
    assert(prefixes("User-agent: *\nUser-agent: somebot\nDisallow: /x\n\n" +
      "User-agent: other\nDisallow: /other\n") === Seq("/x"))
    // trailing agent line with no rules at all -> nothing
    assert(prefixes("User-agent: somebot\nDisallow: /s\n\nUser-agent: *\n")
      === Seq.empty)
  }

  private def blockedFor(txt: String, agent: String, path: String): Boolean =
    Seq((txt, path)).toDF("t", "path")
      .select(Robots.isBlockedByRules(col("path"),
        Robots.rulesFor(col("t"), lit(agent))).as("b"))
      .collect().head.getBoolean(0)

  test("rulesFor: a named bot obeys ITS group (case-insensitive exact " +
      "token), falls back to '*' only when no group names it, and its " +
      "rules never leak to the bulk policy") {
    val txt = "User-agent: GraftBot\nDisallow: /g\n\n" +
      "User-agent: *\nDisallow: /p\n"
    assert(blockedFor(txt, "graftbot", "/g/x"))   // its own group, ci match
    assert(!blockedFor(txt, "graftbot", "/p/x"))  // '*' does NOT also apply
    assert(blockedFor(txt, "otherbot", "/p/x"))   // no group -> '*' fallback
    assert(!blockedFor(txt, "otherbot", "/g/x"))
    assert(blocked(txt, "/p/x") && !blocked(txt, "/g/x")) // bulk unchanged
    // exact-token contract: 'graft' must not prefix-match 'graftbot'
    assert(!blockedFor(txt, "graft", "/g/x"))
    assert(blockedFor(txt, "graft", "/p/x"))
    // multiple groups naming the same bot combine
    val multi = "User-agent: bot\nDisallow: /a\n\nUser-agent: bot\n" +
      "Disallow: /b\n\nUser-agent: *\nDisallow: /c\n"
    assert(blockedFor(multi, "bot", "/a/x") && blockedFor(multi, "bot", "/b/x"))
    assert(!blockedFor(multi, "bot", "/c/x"))
    // a stacked line names the bot: it inherits the block that follows
    val stacked = "User-agent: graftbot\nUser-agent: newsbot\n" +
      "Disallow: /n\n\nUser-agent: *\nDisallow: /p\n"
    assert(blockedFor(stacked, "graftbot", "/n/x"))
    assert(!blockedFor(stacked, "graftbot", "/p/x"))
  }

  test("sitemapLocs: urlset and sitemapindex <loc> extraction, padding " +
      "trimmed, siblings ignored, deduped") {
    def locs(xml: String): Seq[String] =
      Seq(xml).toDF("x")
        .select(Robots.sitemapLocs(col("x")).as("l"))
        .collect().head.getSeq[String](0)
    val urlset = """<?xml version="1.0"?>
      |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      |  <url><loc>https://a.test/p1</loc><lastmod>2026-01-01</lastmod></url>
      |  <url><loc>
      |      https://a.test/p2  </loc><priority>0.5</priority></url>
      |  <url><loc>https://a.test/p1</loc></url>
      |</urlset>""".stripMargin
    assert(locs(urlset) === Seq("https://a.test/p1", "https://a.test/p2"))
    // a sitemapindex's locs surface the same way (caller re-fetches)
    val index = "<sitemapindex><sitemap><LOC>https://a.test/sm1.xml</LOC>" +
      "</sitemap></sitemapindex>"
    assert(locs(index) === Seq("https://a.test/sm1.xml"))
    assert(locs("<urlset></urlset>") === Seq.empty)
  }

  test("sitemapLocs decodes the predefined XML entities (&amp; last, so " +
      "&amp;lt; stays literal)") {
    def locs(xml: String): Seq[String] =
      Seq(xml).toDF("x")
        .select(Robots.sitemapLocs(col("x")).as("l"))
        .collect().head.getSeq[String](0)
    assert(locs("<urlset><url><loc>https://a.test/p?a=1&amp;b=2</loc></url>" +
      "</urlset>") === Seq("https://a.test/p?a=1&b=2"))
    assert(locs("<url><loc>https://a.test/&quot;q&apos;&lt;&gt;</loc></url>")
      === Seq("https://a.test/\"q'<>"))
    // double-escaped: &amp;lt; is the TEXT '&lt;', never '<'
    assert(locs("<url><loc>https://a.test/x&amp;lt;y</loc></url>")
      === Seq("https://a.test/x&lt;y"))
  }

  test("sitemapEntries pairs loc with ITS block's lastmod, null when " +
      "absent, padding trimmed, entities decoded, deduped") {
    def entries(xml: String): Seq[(String, Option[String])] =
      Seq(xml).toDF("x")
        .select(Robots.sitemapEntries(col("x")).as("e"))
        .collect().head.getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getString(0), Option(r.getString(1))))
    val xml = """<urlset>
      |  <url><loc>https://a.test/p1</loc><lastmod>2026-01-05</lastmod></url>
      |  <url><loc>
      |     https://a.test/p2 </loc><priority>0.5</priority></url>
      |  <url><lastmod>2026-09-09</lastmod><loc>https://a.test/p3?x=1&amp;y=2</loc></url>
      |  <url><loc>https://a.test/p1</loc><lastmod>2026-01-05</lastmod></url>
      |</urlset>""".stripMargin
    assert(entries(xml) === Seq(
      ("https://a.test/p1", Some("2026-01-05")),
      ("https://a.test/p2", None),
      ("https://a.test/p3?x=1&y=2", Some("2026-09-09"))))
    // a sitemapindex's <sitemap> blocks pair the same way — and a
    // loc-less block contributes nothing (no null-loc struct)
    assert(entries("<sitemapindex><sitemap><loc>https://a.test/s.xml</loc>" +
      "<lastmod>2026-02-02</lastmod></sitemap><sitemap>" +
      "<lastmod>2026-03-03</lastmod></sitemap></sitemapindex>")
      === Seq(("https://a.test/s.xml", Some("2026-02-02"))))
  }

  test("isBlockedWithFetchStatus: 2xx evaluates rules, 4xx allows all, " +
      "5xx/3xx/timeout block all (RFC 9309 §2.3.1)") {
    val rules = Robots.rules(lit("User-agent: *\nDisallow: /a\n"))
    val got = Seq(200, 204, 404, 410, 503, 500, 301)
      .toDF("st")
      .select(col("st"),
        Robots.isBlockedWithFetchStatus(col("st"), lit("/a/x"), rules)
          .as("ba"),
        Robots.isBlockedWithFetchStatus(col("st"), lit("/ok"), rules)
          .as("bo"))
      .collect().map(r => r.getInt(0) -> (r.getBoolean(1), r.getBoolean(2)))
      .toMap
    assert(got(200) === (true, false))   // rules evaluate
    assert(got(204) === (true, false))
    assert(got(404) === (false, false))  // unavailable: MAY access all
    assert(got(410) === (false, false))
    assert(got(503) === (true, true))    // unreachable: complete disallow
    assert(got(500) === (true, true))
    assert(got(301) === (true, true))    // unresolved redirect: conservative
    // timeout modeled as null status -> block
    val t = Seq(Tuple1(null.asInstanceOf[Integer])).toDF("st")
      .select(Robots.isBlockedWithFetchStatus(col("st"), lit("/ok"), rules))
      .collect().head.getBoolean(0)
    assert(t)
  }

  test("indented directives: extraction tolerates leading whitespace in " +
      "lockstep with the own-directive group-merge check") {
    // the ADVICE case: an indented rule block made the group classed
    // directive-BEARING (suppressing §2.1 inheritance for a stacked
    // User-agent line above) while contributing zero rules/delay
    val txt = "User-agent: *\n  Disallow: /a\n\tAllow: /a/b\n  Crawl-delay: 4\n"
    val r = Seq(txt).toDF("t").select(
      Robots.rules(col("t")).as("r"),
      Robots.disallowPrefixes(col("t")).as("p"),
      Robots.crawlDelaySeconds(col("t")).as("d")).collect().head
    assert(r.getSeq[org.apache.spark.sql.Row](0).map(x =>
      (x.getString(0), x.getBoolean(1))).toSet
      === Set(("/a", false), ("/a/b", true)))
    assert(r.getSeq[String](1) === Seq("/a"))
    assert(r.getDouble(2) === 4.0)
    // stacked agent above an INDENTED block: the block is own-directive
    // (so no inheritance hop past it) AND its rules now extract
    val stacked = "User-agent: a\nUser-agent: b\n  Disallow: /x\n"
    val rb = Seq(stacked).toDF("t").select(
      Robots.rulesFor(col("t"), lit("a")).as("ra"),
      Robots.rulesFor(col("t"), lit("b")).as("rb")).collect().head
    assert(rb.getSeq[org.apache.spark.sql.Row](0).map(_.getString(0))
      === Seq("/x"))
    assert(rb.getSeq[org.apache.spark.sql.Row](1).map(_.getString(0))
      === Seq("/x"))
  }

  test("crawlDelaySecondsFor: per-bot delay with '*' fallback") {
    def delayFor(txt: String, agent: String): Option[Double] = {
      val r = Seq(txt).toDF("t")
        .select(Robots.crawlDelaySecondsFor(col("t"), lit(agent)).as("d"))
        .collect().head
      if (r.isNullAt(0)) None else Some(r.getDouble(0))
    }
    val txt = "User-agent: graftbot\nCrawl-delay: 7\nDisallow: /g\n\n" +
      "User-agent: *\nCrawl-delay: 2\n"
    assert(delayFor(txt, "graftbot") === Some(7.0))
    assert(delayFor(txt, "otherbot") === Some(2.0))
    // a named group WITHOUT a delay does not fall through to '*' — the
    // bot's policy is its group, delay absent means unthrottled
    assert(delayFor("User-agent: graftbot\nDisallow: /g\n\n" +
      "User-agent: *\nCrawl-delay: 2\n", "graftbot") === None)
  }

  test("rules: a longer wildcard Disallow outranks a shorter Allow; " +
      "'*bot' group rules never contribute; null-safe") {
    val txt = "User-agent: *bot\nDisallow: /\n\n" +
      "User-agent: *\nAllow: /d/\nDisallow: /d/*7$\n"
    assert(blocked(txt, "/d/17"))   // len-7 Disallow beats len-3 Allow
    assert(!blocked(txt, "/d/18"))  // only the decoy-loser Allow matches
    val nullPath = Seq("User-agent: *\nDisallow: /a\n").toDF("t")
      .select(Robots.isBlockedByRules(lit(null).cast("string"),
        Robots.rules(col("t"))).as("b"))
      .collect().head.getBoolean(0)
    assert(!nullPath)
  }
}
