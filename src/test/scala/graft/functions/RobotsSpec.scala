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
}
