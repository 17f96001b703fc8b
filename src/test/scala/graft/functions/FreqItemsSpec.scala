package graft.functions

import graft.SparkSpec
import graft.operators.Curation
import org.apache.spark.sql.functions._

class FreqItemsSpec extends SparkSpec {
  import spark.implicits._

  test("MG guarantees: est <= exact, undercount <= N/(k+1), heavy items present") {
    // zipf-ish adversarial stream: item i appears 1000/i times, i in 1..200,
    // spread over 8 partitions so map-side partials + merges all exercise
    val rows = (1 to 200).flatMap(i => Seq.fill(1000 / i)(s"item$i"))
    val n = rows.length.toLong
    val k = 32
    val df = spark.sparkContext.parallelize(rows, 8).toDF("item")

    val summary = df
      .agg(MisraGries.freqItemsMg(col("item"), k).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e.item"), col("e.est_count"))
      .as[(String, Long)].collect().toMap
    assert(summary.size <= k)

    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    summary.foreach { case (item, est) =>
      assert(est <= exact(item), s"$item overestimated: $est > ${exact(item)}")
      assert(exact(item) - est <= n / (k + 1),
        s"$item undercounted past the bound: ${exact(item)} - $est > ${n / (k + 1)}")
    }
    // completeness: every item with true count > N/(k+1) is in the summary
    exact.filter(_._2 > n / (k + 1)).keys.foreach { heavy =>
      assert(summary.contains(heavy), s"heavy item $heavy missing from summary")
    }
  }

  test("estimates are sorted desc with item-asc tiebreak; SQL registration works") {
    val df = Seq.fill(5)("a").map(Tuple1(_)).toDF("v")
      .union(Seq.fill(3)("b").map(Tuple1(_)).toDF("v"))
      .union(Seq.fill(3)("c").map(Tuple1(_)).toDF("v"))
    df.createOrReplaceTempView("freq_in")
    val out = spark.sql("SELECT freq_items_mg(v, 10) AS s FROM freq_in")
      .select(explode(col("s")).as("e"))
      .select(col("e.item"), col("e.est_count"))
      .as[(String, Long)].collect().toSeq
    assert(out === Seq(("a", 5L), ("b", 3L), ("c", 3L)))
  }

  test("heavyHitters two-pass output is exactly the exact group-count answer") {
    val rows = (1 to 100).flatMap(i => Seq.fill(500 / i)(s"w$i"))
    val items = spark.sparkContext.parallelize(rows, 4).toDF("word").persist()
    items.count()
    val hh = Curation.heavyHitters(items, "word", k = 64, minShare = 0.02)
      .select("word", "cnt")
    val n = rows.length.toLong
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c > n * 0.02 }.toMap
    val got = hh.as[(String, Long)].collect().toMap
    assert(got === exact)
    items.unpersist()
  }

  test("a tiny k still never fabricates counts on a uniform stream") {
    // uniform stream: nothing is heavy; summary may be anything but
    // estimates must stay <= true counts (= 2 each)
    val rows = (1 to 500).flatMap(i => Seq(s"u$i", s"u$i"))
    val df = spark.sparkContext.parallelize(rows, 4).toDF("item")
    val summary = df.agg(MisraGries.freqItemsMg(col("item"), 8).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e.est_count")).as[Long].collect()
    assert(summary.forall(_ <= 2L))
  }
}
