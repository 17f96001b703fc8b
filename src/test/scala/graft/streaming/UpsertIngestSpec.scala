package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class UpsertIngestSpec extends SparkSpec {
  import spark.implicits._

  private def latest(path: String) =
    UpsertIngest.readLatest(spark, path, "k")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap

  test("changelog resolve equals the copy-on-write merge across batches") {
    val dir = Files.createTempDirectory("upsertingest").toFile
    dir.deleteOnExit()
    val tbl = dir.getAbsolutePath + "/tbl"
    val cp = dir.getAbsolutePath + "/cp"
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Long, String, Long)]
    val updates = input.toDF().toDF("k", "v", "n")
    val q = UpsertIngest.start(updates, tbl, cp)
    try {
      input.addData((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L))
      q.processAllAvailable()
      input.addData((2L, "B2", 2L), (4L, "d", 2L)) // update 2, insert 4
      q.processAllAvailable()
    } finally q.stop()
    assert(latest(tbl) === Map(
      1L -> ("a", 1L), 2L -> ("B2", 2L), 3L -> ("c", 1L), 4L -> ("d", 2L)))
    // equals the copy-on-write merge of the same two batches
    val merged = graft.sinks.Upsert.merged(
        Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L)).toDF("k", "v", "n"),
        Seq((2L, "B2", 2L), (4L, "d", 2L)).toDF("k", "v", "n"), "k")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(latest(tbl) === merged)
  }

  test("replay is a no-op; a crashed append rewrites; empty batch advances") {
    val dir = Files.createTempDirectory("upsertreplay").toFile
    dir.deleteOnExit()
    val tbl = dir.getAbsolutePath + "/tbl"
    val b0 = Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "v", "n")
    val b1 = Seq((2L, "B2", 2L)).toDF("k", "v", "n")
    UpsertIngest.processBatch(b0, 0L, tbl)
    UpsertIngest.processBatch(b0, 0L, tbl) // marker short-circuits
    // crash window: batch 1's partition lands WITHOUT its marker
    b1.withColumn("batch_id", lit(1L))
      .write.mode("append").partitionBy("batch_id").parquet(s"$tbl/log")
    UpsertIngest.processBatch(b1, 1L, tbl) // deletes partial, rewrites
    UpsertIngest.processBatch(b1.limit(0), 2L, tbl) // empty: marker only
    assert(latest(tbl) === Map(1L -> ("a", 1L), 2L -> ("B2", 2L)))
    assert(BatchMarker.landed(spark, tbl, "log", 2L))
    // compaction story: merge the resolved view, start a fresh log
    val resolved = UpsertIngest.readLatest(spark, tbl, "k")
    val tbl2 = dir.getAbsolutePath + "/tbl2"
    UpsertIngest.processBatch(resolved, 0L, tbl2)
    assert(latest(tbl2) === latest(tbl))
  }

  test("CDC soft delete: a tombstone row wins the key, serving read filters") {
    // deletes over a changelog are just upserts of a deleted=true row —
    // latest-batch-per-key makes the tombstone win, and the serving view
    // filters it; compaction of the FILTERED view drops deleted keys
    // from the fresh log entirely
    val dir = Files.createTempDirectory("upserttomb").toFile
    dir.deleteOnExit()
    val tbl = dir.getAbsolutePath + "/tbl"
    val b0 = Seq((1L, "a", false), (2L, "b", false)).toDF("k", "v", "deleted")
    val b1 = Seq((2L, "b", true)).toDF("k", "v", "deleted") // tombstone for 2
    UpsertIngest.processBatch(b0, 0L, tbl)
    UpsertIngest.processBatch(b1, 1L, tbl)
    val serving = UpsertIngest.readLatest(spark, tbl, "k")
      .filter(!col("deleted"))
    assert(serving.select("k").as[Long].collect().toSet === Set(1L))
    // compact the filtered view: key 2 is gone from the fresh log
    val tbl2 = dir.getAbsolutePath + "/tbl2"
    UpsertIngest.processBatch(serving, 0L, tbl2)
    assert(spark.read.parquet(s"$tbl2/log").select("k").as[Long]
      .collect().toSet === Set(1L))
  }
}
