package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Exactly-once restart semantics — the property a 100 TB streaming ingest
  * actually depends on: a query stopped mid-stream and restarted from its
  * CHECKPOINT must neither re-emit what it already wrote (the file sink
  * commits via _spark_metadata) nor lose the operator STATE accumulated
  * before the stop (dropDuplicatesWithinWatermark's seen-set comes back
  * from the state store, so a duplicate arriving after the restart is
  * still dropped).
  */
class RestartSpec extends SparkSpec {
  import spark.implicits._

  test("file-source ingest restarts exactly-once, dedup state survives") {
    val root = Files.createTempDirectory("restart").toFile
    root.deleteOnExit()
    val in = root.getAbsolutePath + "/in"
    val out = root.getAbsolutePath + "/out"
    val cp = root.getAbsolutePath + "/cp"
    new java.io.File(in).mkdirs()

    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("source", StringType), StructField("ingest_ts", TimestampType)))

    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def writeBatch(name: String, rows: Seq[(Long, String, String, java.sql.Timestamp)]): Unit =
      rows.toDF("doc_id", "text", "source", "ingest_ts")
        .coalesce(1).write.parquet(s"$in/$name")

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet").parquet(in + "/*")
      val q = DocIngest.dedupByContent(stream, watermark = "1 hour")
        .select("doc_id", "content_md5")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    // batch A: two distinct docs
    writeBatch("a", Seq(
      (1L, "alpha body", "web", ts("2024-01-01 10:00:00")),
      (2L, "beta body", "web", ts("2024-01-01 10:01:00"))))
    runOnce()
    assert(spark.read.parquet(out).count() === 2)

    // batch B AFTER the stop: one new doc + a duplicate of doc 1's content
    // inside the watermark — the restarted query must still drop it
    writeBatch("b", Seq(
      (3L, "gamma body", "web", ts("2024-01-01 10:10:00")),
      (4L, "alpha body", "web", ts("2024-01-01 10:11:00"))))
    runOnce()

    val back = spark.read.parquet(out)
    assert(back.count() === 3, "restart re-emitted or dropped rows")
    assert(back.select("doc_id").as[Long].collect().toSet === Set(1L, 2L, 3L),
      "the post-restart duplicate was not dropped by the recovered state")
  }
}
