package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Main-content extraction (functions/Boilerplate): block segmentation in
  * document order, token/link-token accounting, and the verdict matrix —
  * plus the changeSalt drift contract of the snapshot fixture
  * (sources/Warc.responseRecordString).
  */
class BoilerplateSpec extends SparkSpec {

  import spark.implicits._

  private val page =
    """<html><body><div><a href="/">nav0</a> <a href="/a">nav1</a> <a href="/n">nav2</a></div>""" +
      "<p>w1 w2 w3 w4</p>" +
      """<div><a href="/r">more</a> w1 w2 w3 w4 w5 w6</div>""" +
      """<div><a href="/about">about</a> <a href="/contact">contact</a> c0</div>""" +
      "</body></html>"

  test("blocks() segments p/div contents in document order") {
    val got = Seq(page).toDF("body")
      .select(Boilerplate.blocks(col("body"))).as[Seq[String]].head()
    assert(got.length === 4)
    assert(got(1) === "w1 w2 w3 w4")
    assert(got(0).startsWith("<a href=\"/\">nav0</a>"))
    assert(got(3).endsWith("c0"))
  }

  test("verdict matrix: nav and footer drop, content and the link-bearing related strip keep") {
    val rows = Seq(page).toDF("body")
      .select(posexplode(Boilerplate.blocks(col("body"))).as(Seq("pos", "raw")))
      .select(col("pos"),
        Boilerplate.tokenCount(Boilerplate.blockText(col("raw"))).as("t"),
        Boilerplate.tokenCount(Boilerplate.linkText(col("raw"))).as("lt"))
      .withColumn("kept", Boilerplate.isContent(col("t"), col("lt")))
      .orderBy("pos")
      .select("t", "lt", "kept").as[(Long, Long, Boolean)].collect()
    assert(rows(0) === ((3L, 3L, false))) // nav: density 1
    assert(rows(1) === ((4L, 0L, true))) // content
    assert(rows(2) === ((7L, 1L, true))) // related: 1/7 < 0.35
    assert(rows(3) === ((3L, 2L, false))) // footer: 2/3
  }

  test("tag-name boundaries: <pre>/<picture> are not p-blocks, <abbr> is not an anchor") {
    val tricky = "<pre>code code code</pre><p>w1 w2 w3</p>" +
      "<div><abbr>NASA</abbr> w1 w2 w3 w4</div>"
    val got = Seq(tricky).toDF("body")
      .select(Boilerplate.blocks(col("body"))).as[Seq[String]].head()
    // the <pre> block must NOT match as a p-block (nor make the p regex
    // scan from <pre> to the real </p>); the div's <abbr> contributes
    // zero anchor tokens
    assert(got === Seq("w1 w2 w3", "<abbr>NASA</abbr> w1 w2 w3 w4"))
    val lt = Seq(got(1)).toDF("raw")
      .select(Boilerplate.tokenCount(Boilerplate.linkText(col("raw"))))
      .as[Long].head()
    assert(lt === 0L)
  }

  test("thin content (under 3 tokens) drops; empty blocks never surface as segments") {
    val rows = Seq("<p>w1 w2</p><div></div>").toDF("body")
      .select(posexplode(Boilerplate.blocks(col("body"))).as(Seq("pos", "raw")))
      .select(
        Boilerplate.tokenCount(Boilerplate.blockText(col("raw"))).as("t"),
        Boilerplate.tokenCount(Boilerplate.linkText(col("raw"))).as("lt"))
      .withColumn("kept", Boilerplate.isContent(col("t"), col("lt")))
      .select("t", "kept").as[(Long, Boolean)].collect()
    assert(rows.toSeq === Seq((2L, false)))
  }

  test("nested blocks segment at every boundary (the real-nav-chrome case the regex form truncated)") {
    val nested = "<html><body><div>intro <div>inner1</div> middle " +
      "<p>inner2</p> tail</div><p>after</p></body></html>"
    val got = Seq(nested).toDF("body")
      .select(Boilerplate.blocks(col("body"))).as[Seq[String]].head()
    assert(got === Seq("intro ", "inner1", " middle ", "inner2", " tail", "after"))
    // nested nav chrome: every segment is all-anchor or blank -> all drop
    val nav = "<div><div><a href=\"/\">nav0</a> <a href=\"/a\">nav1</a></div> " +
      "<a href=\"/crumb\">crumb</a></div><p>w1 w2 w3 w4</p>"
    val verdicts = Seq(nav).toDF("body")
      .select(posexplode(Boilerplate.blocks(col("body"))).as(Seq("pos", "raw")))
      .select(
        Boilerplate.tokenCount(Boilerplate.blockText(col("raw"))).as("t"),
        Boilerplate.tokenCount(Boilerplate.linkText(col("raw"))).as("lt"))
      .withColumn("kept", Boilerplate.isContent(col("t"), col("lt")))
      .select("kept").as[Boolean].collect()
    assert(verdicts.toSeq === Seq(false, false, true)) // nav-inner, crumb, content
    // self-closing and unclosed corners: boundary without depth change;
    // an unclosed trailing block still emits
    val corners = Seq("<div>a<div/>b</div>", "<p>dangling").toDF("body")
      .select(Boilerplate.blocks(col("body"))).as[Seq[String]].collect()
    assert(corners(0) === Seq("a", "b"))
    assert(corners(1) === Seq("dangling"))
    // uppercase tags segment too
    val upper = Seq("<DIV>w1 w2</DIV><P>w3</P>").toDF("body")
      .select(Boilerplate.blocks(col("body"))).as[Seq[String]].head()
    assert(upper === Seq("w1 w2", "w3"))
  }

  test("comments and script/style rawtext are skipped wholesale — block tags inside them " +
      "neither corrupt depth nor surface as segments") {
    def blocksOf(html: String): Seq[String] =
      Seq(html).toDF("body")
        .select(Boilerplate.blocks(col("body"))).as[Seq[String]].head()
    // the fixture's decoy shape: a script STRING carrying a block tag
    assert(blocksOf("<head><script>var nav = \"<div>decoy</div>\";</script></head>" +
      "<body><div>real</div></body>") === Seq("real"))
    // script INSIDE a block: its code never reaches the segment text
    assert(blocksOf("<div>before <script>if (a<b) x(\"<p>\");</script>after</div>")
      === Seq("before after"))
    // comments at depth too, and <style>
    assert(blocksOf("<div>a<!-- <div>ghost</div> -->b</div>") === Seq("ab"))
    assert(blocksOf("<style>.x{}</style><p>w</p><style>div{color:red}</style>")
      === Seq("w"))
    // unterminated constructs consume to EOF instead of derailing
    assert(blocksOf("<div>kept</div><script>var x = '<div>") === Seq("kept"))
    // <scripted> is NOT a script tag (delimiter check)
    assert(blocksOf("<div><scripted>t</scripted> w1</div>")
      === Seq("<scripted>t</scripted> w1"))
  }

  test("changeSalt: salt 0 is byte-identical, salt 1 drifts exactly the d%4==3 200-status class") {
    (0L until 60L).foreach { d =>
      val base = graft.sources.Warc.responseRecordString(d, linkSpace = 60L)
      val salt0 = graft.sources.Warc.responseRecordString(d, linkSpace = 60L, changeSalt = 0L)
      val salt1 = graft.sources.Warc.responseRecordString(d, linkSpace = 60L, changeSalt = 1L)
      assert(salt0 === base, s"doc $d: salt 0 must be the identity")
      val shouldDrift = d % 4 == 3 && d % 11 != 0
      assert((salt1 != base) === shouldDrift, s"doc $d: drift class mismatch")
      if (shouldDrift) {
        // only the word run moves; the record identity (type, id, uri)
        // stays fixed (Content-Length MAY move — w9 vs w10 differ in
        // width, exactly like real re-fetches)
        assert(salt1.linesIterator.take(4).toSeq === base.linesIterator.take(4).toSeq)
        assert(salt1.contains("HTTP/1.1 200 OK"))
      }
    }
  }

  test("bpResponseRecordString: related strip appears only on d%4==1, 404s keep the plain body") {
    val with404 = graft.sources.Warc.bpResponseRecordString(0L)
    assert(with404.contains("404 Not Found") && with404.contains("not found"))
    val related = graft.sources.Warc.bpResponseRecordString(1L)
    assert(related.contains("<a href=\"/r\">more</a> w1 w2 w3 w4 w5 w6"))
    val plain = graft.sources.Warc.bpResponseRecordString(2L)
    assert(!plain.contains("\"/r\""))
    assert(plain.contains("""<div><a href="/">nav0</a>"""))
  }
}
