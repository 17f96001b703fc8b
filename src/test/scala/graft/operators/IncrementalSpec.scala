package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b c", "s1"), (2L, "d e", "s1"), (3L, "f", "s2"),
    (4L, "g h i j", "s2"), (5L, "k l", "s1"), (6L, "m", "s2"))
    .toDF("doc_id", "text", "source")

  test("additive states: any split and any merge order equals the full recompute") {
    val full = Incremental.tokenTotalsState(docs, "text", "source")

    val byParity = Seq(
      Incremental.tokenTotalsState(docs.filter(col("doc_id") % 2 === 0), "text", "source"),
      Incremental.tokenTotalsState(docs.filter(col("doc_id") % 2 === 1), "text", "source"))
    val byRange = Seq(
      Incremental.tokenTotalsState(docs.filter(col("doc_id") <= 2), "text", "source"),
      Incremental.tokenTotalsState(docs.filter(col("doc_id").between(3, 4)), "text", "source"),
      Incremental.tokenTotalsState(docs.filter(col("doc_id") >= 5), "text", "source"))

    for (states <- Seq(byParity, byRange, byRange.reverse)) {
      val merged = Incremental.mergeTokenTotals(states, "source")
      assert(merged.exceptAll(full).count() === 0)
      assert(full.exceptAll(merged).count() === 0)
    }
  }

  test("sketch states: union of overlapping batches never double-counts") {
    // users 0..99 in batch A, 50..149 in batch B: true distinct = 150
    val a = spark.range(0, 100).select(lit("t").as("k"), col("id").as("user"))
    val b = spark.range(50, 150).select(lit("t").as("k"), col("id").as("user"))
    val merged = Incremental.mergeDistinctSketches(
      Seq(Incremental.distinctSketchState(a, "k", "user"),
        Incremental.distinctSketchState(b, "k", "user")), "k")
      .select("approx_distinct").as[Double].head()
    assert(math.abs(merged - 150.0) / 150.0 < 0.05,
      s"merged estimate $merged vs true 150")

    // lossless union: merged estimate equals the single-pass sketch of a+b
    val single = Incremental.mergeDistinctSketches(
      Seq(Incremental.distinctSketchState(a.unionByName(b), "k", "user")), "k")
      .select("approx_distinct").as[Double].head()
    assert(merged === single)
  }
}
