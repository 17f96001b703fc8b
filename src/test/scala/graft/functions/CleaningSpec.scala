package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CleaningSpec extends SparkSpec {

  private def clean(s: String): Option[String] = {
    import spark.implicits._
    Seq(s).toDF("v").select(Cleaning.cleanString(col("v"))).as[Option[String]].head()
  }

  test("clean_string collapses \\r\\n\\t runs and multi-spaces, trims") {
    assert(clean("a\r\n\tb   c ") === Some("a b c"))
  }

  test("clean_string strips HTML tags and entities") {
    assert(clean("<p>hello <b>world</b></p>") === Some("hello world"))
    assert(clean("a&nbsp;&amp;&nbsp;b") === Some("a & b"))
  }

  test("clean_string NULL contract: empty / whitespace / no word char → NULL (utils.py:78-87)") {
    assert(clean("") === None)
    assert(clean("   \t\n ") === None)
    assert(clean("!!! --- ***") === None)
  }

  test("clean_string is idempotent on word-bearing strings (seeded property)") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcXYZ019 \t\r\n<>&-"
    (1 to 60).foreach { _ =>
      val s = Seq.fill(rnd.nextInt(30) + 1)(alphabet(rnd.nextInt(alphabet.length))).mkString
      clean(s).foreach { c => assert(clean(c) === Some(c), s"not idempotent for ${s.getBytes.toSeq}") }
    }
  }

  test("tinyintToBool: bool(None) == False semantics (F6)") {
    import spark.implicits._
    val r = Seq[Option[Int]](Some(1), Some(0), Some(2), None).toDF("v")
      .select(Cleaning.tinyintToBool(col("v"))).as[Boolean].collect()
    assert(r.toSeq === Seq(true, false, true, false))
  }

  test("toDatetimeLegacy parses 'Mon Jan 02 15:04:05 GMT 2006'; falsey → NULL (utils.py:90-102)") {
    import spark.implicits._
    val r = Seq("Mon Jan 02 15:04:05 GMT 2006", "", null)
      .toDF("v").select(Cleaning.toDatetimeLegacy(col("v")).cast("string"))
      .as[Option[String]].collect()
    assert(r(0) === Some("2006-01-02 15:04:05"))
    assert(r(1) === None)
    assert(r(2) === None)
  }

  test("findNames splits on ' and '/'&' and extracts name tokens (utils.py:56-66)") {
    import spark.implicits._
    val r = Seq("Smith and Jones & Garcia-Lopez").toDF("v")
      .select(Cleaning.findNames(col("v"))).as[Seq[String]].head()
    assert(r.contains("Smith"))
    assert(r.exists(_.contains("Garcia")))
  }

  test("fused cleanString is bit-identical to the builtin chain") {
    import spark.implicits._
    val crafted = Seq(
      "plain", "", " ", "\t\r\n", "  double  spaces  ", "a\tb\r\nc",
      "<b>tag</b> text", "a<br>b", "unterminated < stays", "<>",
      "&amp; &lt; &gt; &quot; &#39; &nbsp;", "&amp;lt;", "&amp;amp;",
      "nb sp    runs", "no word chars: <>&;!", "___",
      "punct only !!!", "é accents only", "é mixed word", "x",
      "<a href='q>r'>attr</a>", "tabs\t\t<p>\ttags</p>\tmix",
      "&unknown; entity", "trailing space ", " leading", "a  <b>  c")
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text").as("s"))
      .union(crafted.toDF("s"))
    val bad = corpus
      .select(col("s"), Cleaning.cleanStringChain(col("s")).as("old"),
        Cleaning.cleanString(col("s")).as("new"))
      .filter(!(col("old") <=> col("new")))
      .limit(5).collect()
    assert(bad.isEmpty,
      bad.map(r => s"in=${r.get(0)} old=${r.get(1)} new=${r.get(2)}").mkString("\n"))
    // null passthrough
    val r = Seq[Option[String]](None).toDF("s")
      .select(Cleaning.cleanString(col("s"))).collect()
    assert(r(0).isNullAt(0))
  }

  test("cleanInstitution: alias map, 'nil' sentinel → NULL (utils.py:105-124)") {
    import spark.implicits._
    val aliases = typedLit(Map("nhm london" -> "Natural History Museum", "bad place" -> "nil"))
    val r = Seq("nhm london", "bad place", "unmapped uni").toDF("v")
      .select(Cleaning.cleanInstitution(col("v"), aliases)).as[Option[String]].collect()
    assert(r.toSeq === Seq(Some("Natural History Museum"), None, Some("unmapped uni")))
  }
}
