package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave/deinterleave round-trip on 32-bit corners and a sweep") {
    val vals = Seq[Long](0L, 1L, 2L, 3L, 255L, 256L, 65535L, 65536L,
      4294967295L, 123456789L)
    val df = vals.flatMap(a => vals.map(b => (a, b))).toDF("a", "b")
    val z = df.withColumn("z", ZOrder.interleave(col("a"), col("b")))
    val (ra, rb) = ZOrder.deinterleave(col("z"))
    val bad = z.withColumn("ra", ra).withColumn("rb", rb)
      .filter(col("ra") =!= col("a") || col("rb") =!= col("b"))
    assert(bad.count() === 0)
  }

  test("known codes: interleave matches hand-computed Morton values") {
    // z(1,0)=1 (a on even bits), z(0,1)=2, z(3,3)=15, z(5,0)=17
    val rows = Seq((1L, 0L), (0L, 1L), (3L, 3L), (5L, 0L)).toDF("a", "b")
      .select(ZOrder.interleave(col("a"), col("b")).as("z"))
      .as[Long].collect().toSeq
    assert(rows === Seq(1L, 2L, 15L, 17L))
  }

  test("locality: equal-size z-ordered buckets prune a 2-D box better than a single-key sort") {
    // 64x64 grid, 16 buckets of 256 rows each. Under z-order the buckets
    // are 16x16 tiles, so the box a,b in [0,7]^2 intersects exactly one
    // bucket; under sort-by-a each bucket spans ALL of b, so the box
    // intersects every bucket whose a-range touches [0,7] AND their full
    // b-extent — no pruning on b at all.
    val grid = spark.range(0, 4096)
      .select((col("id") % 64).as("a"), (col("id") / 64).as("b"))
    def overlapping(bucketed: org.apache.spark.sql.DataFrame): Long =
      bucketed
        .groupBy(col("bucket"))
        .agg(min(col("a")).as("min_a"), max(col("a")).as("max_a"),
          min(col("b")).as("min_b"), max(col("b")).as("max_b"))
        .filter(col("min_a") <= 7 && col("max_a") >= 0 &&
          col("min_b") <= 7 && col("max_b") >= 0)
        .count()
    val byZ = grid
      .withColumn("z", ZOrder.interleave(col("a"), col("b")))
      .withColumn("bucket", floor(col("z") / 256))
    val byA = grid
      .withColumn("bucket", floor((col("a") * 64 + col("b")) / 256))
    assert(overlapping(byZ) === 1L)
    assert(overlapping(byA) === 2L)
  }

  test("the key is plain codegen'd arithmetic: no UDF, no interpreted expression") {
    val plan = spark.range(0, 10)
      .select(ZOrder.interleave(col("id"), col("id")).as("z"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }
}
