package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketing = the pre-shuffle co-located join strategy (builder brief:
  * "repartition/bucketing for co-located joins"). Writing both sides
  * bucketed by the join key lets Spark plan a SortMergeJoin with NO
  * Exchange — at 100 TB this removes the dominant shuffle of fact-fact
  * joins that repeat across runs.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed fact-fact join plans without an Exchange") {
    // warehouse dir is a static conf — tables land in ./spark-warehouse
    // (gitignored) and are dropped below
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")

    (1L to 1000L).map(i => (i, s"o$i")).toDF("order_id", "o")
      .write.bucketBy(4, "order_id").sortBy("order_id").saveAsTable("b_orders")
    (1L to 3000L).map(i => (i % 1000 + 1, i)).toDF("order_id", "line_id")
      .write.bucketBy(4, "order_id").sortBy("order_id").saveAsTable("b_lines")

    val joined = spark.table("b_orders").join(spark.table("b_lines"), "order_id")
    val plan = joined.queryExecution.executedPlan.toString
    assert(joined.count() === 3000)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")
  }
}
