package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** F14 network-stage semantics pinned against
  * /root/reference/synth/parsers/doi.py:129-223 (recognizers + response
  * parsers; the fetch itself is a cache join — see DoiNetwork docs).
  */
class DoiNetworkSpec extends SparkSpec {
  import spark.implicits._

  private def one(in: String, f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Option[String] =
    Option(Seq(in).toDF("v").select(f(col("v")).as("r")).head().getAs[String]("r"))

  test("elsevier PII recognizer + prism:doi response parse") {
    assert(one("els S012345678901ABCD ref", DoiNetwork.elsevierPii) === Some("S012345678901ABCD"))
    assert(one("no pii here", DoiNetwork.elsevierPii) === None)
    assert(one("<coredata><prism:doi>10.1016/j.x.2020.1</prism:doi></coredata>",
      DoiNetwork.elsevierDoiFromXml) === Some("10.1016/j.x.2020.1"))
  }

  test("cambridge URL recognizer prefixes scheme like the reference fetch") {
    assert(one("www.cambridge.org/core/product/ABC", DoiNetwork.cambridgeUrl)
      === Some("http://www.cambridge.org/core/product/ABC"))
    assert(one("https://www.cambridge.org/x", DoiNetwork.cambridgeUrl)
      === Some("https://www.cambridge.org/x"))
    assert(one("example.org/x", DoiNetwork.cambridgeUrl) === None)
  }

  test("ingenta path recognizer") {
    assert(one("http://www.ingentaconnect.com/content/brill/ctz/2004/12/34/art00005",
      DoiNetwork.ingentaPath)
      === Some("ingentaconnect.com/content/brill/ctz/2004/12/34/art00005"))
  }

  test("pensoft: strict id regex first, permissive second, journal fallback," +
      " www-only journal aborts the stage (the reference's swallowed IndexError)") {
    // rgx_1 form on a named journal subdomain
    assert(one("http://zookeys.pensoft.net/articles.php?version=2&id=123",
      DoiNetwork.pensoftRequest)
      === Some("https://zookeys.pensoft.net/article/123/download/bibtex"))
    // rgx_2 second alternative (articles/<id>)
    assert(one("https://subtbiol.pensoft.net/articles/456", DoiNetwork.pensoftRequest)
      === Some("https://subtbiol.pensoft.net/article/456/download/bibtex"))
    // rgx_2 first alternative with the article_ prefix consumed
    assert(one("https://neobiota.pensoft.net/?article_id=789", DoiNetwork.pensoftRequest)
      === Some("https://neobiota.pensoft.net/article/789/download/bibtex"))
    // lookbehind: a '_id=' that is NOT article_id must not match
    assert(one("https://zookeys.pensoft.net/page?ref_id=99", DoiNetwork.pensoftRequest)
      === None)
    // journal matched but only as 'www' -> stage aborts
    assert(one("http://www.pensoft.net/articles/5", DoiNetwork.pensoftRequest) === None)
    // no journal match at all -> zookeys fallback
    assert(one("some zookeys page articles.php?id=7", DoiNetwork.pensoftRequest)
      === Some("https://zookeys.pensoft.net/article/7/download/bibtex"))
  }

  test("pubmed PMC recognizer + ReFindIt JSON parse") {
    assert(one("https://www.ncbi.nlm.nih.gov/pmc/articles/PMC1234567/",
      DoiNetwork.pubmedPmc) === Some("1234567"))
    assert(one("https://elsewhere.org/PMC1234567", DoiNetwork.pubmedPmc) === None)
    assert(one("""[{"doi": "10.1093/pm77", "title": "x"}]""",
      DoiNetwork.doiFromRefindit) === Some("10.1093/pm77"))
  }

  test("resolveFromCaches composes the cascade over a (key, body) cache") {
    val records = Seq(
      (1L, "see els S012345678901ABCD"),
      (2L, "https://subtbiol.pensoft.net/articles/456"),
      (3L, "nothing recognizable")).toDF("id", "url")
    val cache = Seq(
      ("elsevier:S012345678901ABCD",
        "<coredata><prism:doi>10.1016/j.x.1</prism:doi></coredata>"),
      ("pensoft:https://subtbiol.pensoft.net/article/456/download/bibtex",
        "@article{a, doi = {10.3897/zk.456}}")).toDF("key", "body")
    val out = DoiNetwork.resolveFromCaches(records, "url", cache)
      .select("id", "doi").as[(Long, Option[String])].collect().toMap
    assert(out(1L) === Some("10.1016/j.x.1"))
    assert(out(2L) === Some("10.3897/ZK.456")) // bibtex parse normalizes to upper
    assert(out(3L) === None)

    // the melt-join shape is row-identical — same cascade, one cache join
    val melted = DoiNetwork.resolveFromCachesMelted(records, "url", "id", cache)
      .select("id", "doi").as[(Long, Option[String])].collect().toMap
    assert(melted === out)
  }

  test("melt shape preserves parse-order precedence when several stages match") {
    // one URL that recognizes under BOTH elsevier (PII) and cambridge: the
    // cascade must take elsevier's parse even though cambridge also has a
    // cached body
    val records = Seq(
      (1L, "www.cambridge.org/core/product/S012345678901ABCD")).toDF("id", "url")
    val cache = Seq(
      ("elsevier:S012345678901ABCD",
        "<coredata><prism:doi>10.1016/first</prism:doi></coredata>"),
      ("cambridge:http://www.cambridge.org/core/product/S012345678901ABCD",
        "@article{a, doi = {10.1017/second}}")).toDF("key", "body")
    val a = DoiNetwork.resolveFromCaches(records, "url", cache)
      .select("id", "doi").as[(Long, Option[String])].collect().toMap
    val b = DoiNetwork.resolveFromCachesMelted(records, "url", "id", cache)
      .select("id", "doi").as[(Long, Option[String])].collect().toMap
    assert(a(1L) === Some("10.1016/first"))
    assert(b === a)
  }
}
