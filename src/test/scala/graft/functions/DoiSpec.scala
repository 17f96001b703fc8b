package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DoiSpec extends SparkSpec {

  private def extract(s: String): Option[String] = {
    import spark.implicits._
    Seq(s).toDF("v").select(Doi.extractDoi(col("v"))).as[Option[String]].head()
  }

  test("standard DOI extraction + normalization (doi.py:44-66)") {
    assert(extract("see https://doi.org/10.1234/abc.DEF-56 for details")
      === Some("10.1234/ABC.DEF-56"))
  }

  test("trailing dot stripped, URL artifacts cut (doi.py:58-65)") {
    assert(extract("doi:10.1234/xyz.") === Some("10.1234/XYZ"))
    assert(extract("https://x.org/10.1234/xyz/full") === Some("10.1234/XYZ"))
    assert(extract("https://x.org/10.1234/xyz.pdf") === Some("10.1234/XYZ"))
  }

  test("mapress/biotaxa URL stage (doi.py:91-103)") {
    assert(extract("http://www.mapress.com/zootaxa.1234.5.6/abstract")
      === Some("10.11646/zootaxa.1234.5.6"))
  }

  test("nature article stage (doi.py:105-120)") {
    assert(extract("https://www.nature.com/articles/s41586-020-12345-6")
      === Some("10.1038/s41586-020-12345-6"))
  }

  test("cambridge fileId stage (doi.py:122-130)") {
    assert(extract("action/displayAbstract?fileId=S0024282913000145")
      === Some("10.1017/S0024282913000145"))
  }

  test("no match → NULL") {
    assert(extract("no identifiers here") === None)
  }

  test("extractAllStages yields every matching stage with its name (doi.py:13-42 generator parity)") {
    import spark.implicits._
    val r = Seq("https://doi.org/10.1234/abc see also nature.com/articles/s41586-x")
      .toDF("v")
      .select(Doi.extractAllStages(col("v")).as("cands"))
      .selectExpr("transform(cands, c -> c.stage) AS stages")
      .as[Seq[String]].head()
    assert(r.contains("doi_regex"))
    assert(r.contains("nature_regex"))
    assert(r.head === "doi_regex") // stage order preserved
  }

  test("urlFix decodes %2F and drops spaces (doi.py:32-34)") {
    import spark.implicits._
    val r = Seq("10.1234%2Fab cd").toDF("v")
      .select(Doi.extractDoi(Doi.urlFix(col("v")))).as[Option[String]].head()
    assert(r === Some("10.1234/ABCD"))
  }
}
