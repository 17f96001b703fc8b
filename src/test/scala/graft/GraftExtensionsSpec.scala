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
}
