package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("smallest_k keeps the k smallest, ascending, skipping nulls") {
    val df = Seq(
      ("a", Some(5L)), ("a", Some(1L)), ("a", Some(3L)), ("a", None),
      ("a", Some(2L)), ("b", Some(9L)))
      .toDF("k", "v")
    val out = df.groupBy("k")
      .agg(TopK.smallestK(col("v"), 3).as("top"))
      .as[(String, Seq[Long])].collect().toMap
    assert(out("a") === Seq(1L, 2L, 3L))
    assert(out("b") === Seq(9L)) // fewer than k rows -> all of them
  }

  test("struct ordering gives top-k-by-score-desc with tiebreak") {
    val df = Seq(("x", 3L, "bb"), ("x", 3L, "aa"), ("x", 7L, "cc"), ("x", 1L, "dd"))
      .toDF("k", "score", "tag")
    val out = df.groupBy("k")
      .agg(TopK.smallestK(struct((-col("score")).as("neg"), col("tag")), 2).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.neg"), col("e.tag"))
      .as[(Long, String)].collect().toSeq
    assert(out === Seq((-7L, "cc"), (-3L, "aa"))) // score desc, tag asc tiebreak
  }

  test("partial aggregation across many partitions agrees with a single partition") {
    val big = spark.range(0, 10000).select(
      (col("id") % 7).as("k"), ((col("id") * 2654435761L) % 100000).as("v"))
    val many = big.repartition(16).groupBy("k")
      .agg(TopK.smallestK(col("v"), 5).as("top"))
    val one = big.coalesce(1).groupBy("k")
      .agg(TopK.smallestK(col("v"), 5).as("top"))
    assert(many.exceptAll(one).count() === 0)
    assert(one.exceptAll(many).count() === 0)
    // agrees with the sort-based formulation
    val sorted = big.as[(Long, Long)].collect().groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).sorted.take(5).toSeq }
    val got = many.as[(Long, Seq[Long])].collect().toMap
    assert(got === sorted)
  }

  test("string values survive the UnsafeRow spill serialization") {
    val df = Seq("pear", "apple", "quince", "banana", "fig")
      .toDF("s").repartition(4)
    val out = df.agg(TopK.smallestK(col("s"), 2).as("top"))
      .as[Seq[String]].head()
    assert(out === Seq("apple", "banana"))
  }

  test("smallest_k is SQL-registered via GraftExtensions") {
    spark.range(0, 100).createOrReplaceTempView("topk_t")
    val r = spark.sql(
      "SELECT smallest_k(id, 3) FROM topk_t").as[Seq[Long]].head()
    assert(r === Seq(0L, 1L, 2L))
  }
}
