package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class TombstonesSpec extends SparkSpec {
  import spark.implicits._

  test("merge-on-read subtracts tombstones; apply rewrites and resets") {
    val dir = Files.createTempDirectory("tomb").toFile
    dir.deleteOnExit()
    val data = dir.getAbsolutePath + "/data"
    val tomb = dir.getAbsolutePath + "/tombstones"
    val out = dir.getAbsolutePath + "/rewritten"

    spark.range(0, 1000).toDF("doc_id").write.parquet(data)

    // nothing deleted yet: read-through is the full table
    assert(Tombstones.read(spark, data, tomb, "doc_id").count() === 1000)

    // two delete batches accumulate (append-only)
    Tombstones.add(Seq(1L, 5L, 9L).toDF("doc_id"), "doc_id", tomb)
    Tombstones.add(Seq(9L, 500L).toDF("doc_id"), "doc_id", tomb)
    val mor = Tombstones.read(spark, data, tomb, "doc_id")
    assert(mor.count() === 996)
    assert(mor.filter(col("doc_id").isin(1L, 5L, 9L, 500L)).count() === 0)

    // the anti-join broadcasts the tombstone side (no shuffle of the data)
    val plan = mor.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"merge-on-read did not broadcast-anti-join:\n$plan")

    // physical apply: rewrite minus tombstones, tombstones reset
    val applied = Tombstones.apply(spark, data, tomb, "doc_id", out)
    assert(applied === 4)
    assert(spark.read.parquet(out).count() === 996)
    assert(!new java.io.File(tomb).exists())
    // post-apply, reading the rewrite with the (empty) tombstones is stable
    assert(Tombstones.read(spark, out, tomb, "doc_id").count() === 996)
  }
}
