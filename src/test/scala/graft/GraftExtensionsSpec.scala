package graft

class GraftExtensionsSpec extends SparkSpec {

  test("partial_ratio is registered as a SQL function via SparkSessionExtensions") {
    val r = spark.sql(
      "SELECT partial_ratio('hello world', 'hello world!') AS score, " +
        "partial_ratio('abc', NULL) AS n")
      .head()
    assert(r.getAs[Int]("score") === 100)
    assert(r.get(r.fieldIndex("n")) === null)
  }

  test("arity is enforced") {
    intercept[Exception](spark.sql("SELECT partial_ratio('a')").collect())
  }

  test("dot_product and porter_stem are registered as SQL functions") {
    val r = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp, " +
        "porter_stem('running') AS stem").head()
    assert(r.getAs[Double]("dp") === 11.0)
    assert(r.getAs[String]("stem") === "run")
    intercept[Exception](spark.sql("SELECT porter_stem('a', 'b')").collect())
  }

  test("pos_tag and html_text are registered as SQL functions") {
    val r = spark.sql(
      "SELECT pos_tag('family') AS t1, pos_tag('quickly') AS t2, " +
        "html_text('Iron <i>maiden</i>s') AS h").head()
    assert(r.getAs[String]("t1") === "NOUN") // exception lexicon via SQL too
    assert(r.getAs[String]("t2") === "ADV")
    assert(r.getAs[String]("h") === "Iron maidens")
    intercept[Exception](spark.sql("SELECT pos_tag('a', 'b')").collect())
  }
}
