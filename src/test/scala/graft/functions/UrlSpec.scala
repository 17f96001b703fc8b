package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Url.resolveUrl]] against RFC 3986 §5.4's own reference-resolution
  * examples (base `http://a/b/c/d;p?q`), normal and abnormal sets —
  * the published conformance table IS the golden suite. Two deviations
  * by contract, both asserted: a `#`-only ref returns the base WITHOUT
  * the fragment (canonicalization drops fragments later anyway), and
  * resolution output feeds [[Url.canonicalizeUrl]], so scheme/authority
  * case is normalized downstream, not here.
  */
class UrlSpec extends SparkSpec {
  import spark.implicits._

  private val base = "http://a/b/c/d;p?q"

  private def resolve(ref: String): String = {
    val r = Seq((base, ref)).toDF("b", "r")
      .select(Url.resolveUrl(col("b"), col("r")).as("u")).collect().head
    if (r.isNullAt(0)) null else r.getString(0)
  }

  test("RFC 3986 §5.4.1 normal examples") {
    val cases = Seq(
      "g" -> "http://a/b/c/g",
      "./g" -> "http://a/b/c/g",
      "g/" -> "http://a/b/c/g/",
      "/g" -> "http://a/g",
      "//g" -> "http://g",
      "?y" -> "http://a/b/c/d;p?y",
      "g?y" -> "http://a/b/c/g?y",
      "g#s" -> "http://a/b/c/g#s",
      "g?y#s" -> "http://a/b/c/g?y#s",
      ";x" -> "http://a/b/c/;x",
      "g;x" -> "http://a/b/c/g;x",
      "g;x?y#s" -> "http://a/b/c/g;x?y#s",
      "" -> "http://a/b/c/d;p?q",
      "." -> "http://a/b/c/",
      "./" -> "http://a/b/c/",
      ".." -> "http://a/b/",
      "../" -> "http://a/b/",
      "../g" -> "http://a/b/g",
      "../.." -> "http://a/",
      "../../" -> "http://a/",
      "../../g" -> "http://a/g")
    cases.foreach { case (ref, want) =>
      assert(resolve(ref) === want, s"ref <$ref>")
    }
    // deviation by contract: fragment-only ref returns the base sans
    // fragment (RFC keeps "#s"; canonicalization drops it one step later)
    assert(resolve("#s") === "http://a/b/c/d;p?q")
  }

  test("RFC 3986 §5.4.2 abnormal examples") {
    val cases = Seq(
      "../../../g" -> "http://a/g",    // never above root
      "../../../../g" -> "http://a/g",
      "/./g" -> "http://a/g",
      "/../g" -> "http://a/g",
      "g." -> "http://a/b/c/g.",
      ".g" -> "http://a/b/c/.g",
      "g.." -> "http://a/b/c/g..",
      "..g" -> "http://a/b/c/..g",
      "./../g" -> "http://a/b/g",
      "./g/." -> "http://a/b/c/g/",
      "g/./h" -> "http://a/b/c/g/h",
      "g/../h" -> "http://a/b/c/h",
      "g;x=1/./y" -> "http://a/b/c/g;x=1/y",
      "g;x=1/../y" -> "http://a/b/c/y",
      // dot-segments in the query/fragment are NOT path segments
      "g?y/./x" -> "http://a/b/c/g?y/./x",
      "g?y/../x" -> "http://a/b/c/g?y/../x",
      "g#s/./x" -> "http://a/b/c/g#s/./x",
      "g#s/../x" -> "http://a/b/c/g#s/../x",
      // a ref WITH a scheme is already absolute (strict parser)
      "http:g" -> "http:g")
    cases.foreach { case (ref, want) =>
      assert(resolve(ref) === want, s"ref <$ref>")
    }
  }

  test("resolve -> canonicalize composes: relative forms fold onto the " +
      "absolute canonical, absolute refs pass through verbatim") {
    val rows = Seq(
      ("HTTPS://D1.EX.TEST:443/d/8?b=2&a=1#f", "/d/../d/15"),
      ("https://d1.ex.test/d/8", "../d/15"),
      ("https://d1.ex.test/d/8", "https://d1.ex.test/d/15"))
      .toDF("b", "r")
      .select(Url.canonicalizeUrl(Url.resolveUrl(col("b"), col("r"))).as("u"))
      .collect().map(_.getString(0)).toSeq
    assert(rows === Seq.fill(3)("https://d1.ex.test/d/15"))
    // unparseable base -> NULL, the drop-out posture
    val bad = Seq(("not a url", "/x")).toDF("b", "r")
      .select(Url.resolveUrl(col("b"), col("r")).as("u")).collect().head
    assert(bad.isNullAt(0))
  }

  test("native codegen expression is row-for-row equivalent to the retired Column form") {
    val bases = Seq(
      "http://a/b/c/d;p?q", "https://d1.ex.test/d/8",
      "HTTPS://D1.EX.TEST:443/d/8?b=2&a=1#f", "https://h.test",
      "https://h.test/", "http://u@h.test:8080/x/y?q=1",
      "not a url", "d1.ex.test/d/5", "")
    val refs = Seq(
      "g", "./g", "g/", "/g", "//g", "?y", "g?y", "g#s", "g?y#s", ";x",
      "", ".", "./", "..", "../", "../g", "../..", "../../g",
      "../../../g", "/./g", "/../g", "g.", ".g", "g..", "..g", "./../g",
      "./g/.", "g/./h", "g/../h", "g?y/./x", "g#s/../x", "http:g",
      "HTTPS://X.TEST:443/p?b=2&a=1#f", "//x.test/p", "#s", "?", "#",
      "a//b/../c", "/d/../d/15?a=1", "../d/15",
      // non-ASCII first char: Unicode letters are NOT scheme chars (RFC
      // 3986 §3.1 is ASCII-only) — both forms must resolve as relative
      "é:x", "日:y", "ä/g")
    val rows = for (b <- bases; r <- refs) yield (b, r)
    val got = rows.toDF("b", "r")
      .select(
        Url.resolveUrl(col("b"), col("r")).as("native"),
        Url.resolveUrlColumns(col("b"), col("r")).as("columns"))
      .collect()
    rows.zip(got).foreach { case ((b, r), row) =>
      val n = if (row.isNullAt(0)) null else row.getString(0)
      val c = if (row.isNullAt(1)) null else row.getString(1)
      assert(n === c, s"base <$b> ref <$r>")
    }
  }

  test("surt: reversed labels, www fold, port, query tail, sort locality") {
    def surtOf(u: String): String = {
      val r = Seq(u).toDF("u")
        .select(Url.surt(Url.canonicalizeUrl(col("u"))).as("s")).collect().head
      if (r.isNullAt(0)) null else r.getString(0)
    }
    assert(surtOf("https://d3.ex.test/d/42?a=1&b=2") === "test,ex,d3)/d/42?a=1&b=2")
    // www is massaged away; scheme and default port erased
    assert(surtOf("HTTP://WWW.Example.COM:80/a/b") === "com,example)/a/b")
    // non-default port rides BEHIND the reversed host (same-host adjacency)
    assert(surtOf("https://h.test:8443/x") === "test,h:8443)/x")
    // bare path → canonical "/"
    assert(surtOf("https://ex.test") === "test,ex)/")
    assert(surtOf("not a url") === null)
    // the locality property the transform exists for: every page of a
    // host sorts under one prefix, subdomains sort under the domain
    val keys = Seq("https://a.ex.test/z", "https://b.other.test/a",
      "https://a.ex.test/a", "https://ex.test/m").map(surtOf).sorted
    assert(keys === Seq("test,ex)/m", "test,ex,a)/a", "test,ex,a)/z",
      "test,other,b)/a"))
    assert(keys.take(3).forall(_.startsWith("test,ex")))
  }
}
