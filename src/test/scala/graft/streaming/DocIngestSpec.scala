package graft.streaming

import graft.SparkSpec
import graft.operators.Curation
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

class DocIngestSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val good = "the quick brown fox and the dog ran over a hill today"
  private val junk = "x"

  test("gopherPass column is row-identical to gopherFlags' quality_pass") {
    val docs = Seq(
      (1L, good, "s"), (2L, junk, "s"), (3L, "a b", "s"),
      (4L, "the data and the plan and the scan and a key here now", "s"))
      .toDF("doc_id", "text", "source")
    val viaFlags = Curation.gopherFlags(docs, "text", "doc_id",
        stopwords = Seq("the", "a", "and"), minWords = 5)
      .select(col("doc_id"), col("quality_pass"))
    val viaColumn = docs.select(col("doc_id"),
      Curation.gopherPass(col("text"),
        stopwords = Seq("the", "a", "and"), minWords = 5).as("quality_pass"))
    assert(viaFlags.exceptAll(viaColumn).count() === 0)
    assert(viaColumn.exceptAll(viaFlags).count() === 0)
  }

  test("streaming ingest: junk gated out, duplicate content dropped, windows accounted") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Long, String, String, Timestamp)]
    val docs = input.toDF().toDF("doc_id", "text", "source", "ingest_ts")

    val q = DocIngest.curatedTokenCounts(docs, watermark = "10 minutes", window_ = "1 hour")
      .writeStream.format("memory").queryName("ingest")
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(
        (1L, good, "web", ts("2024-01-01 10:05:00")),
        (2L, junk, "web", ts("2024-01-01 10:06:00")),  // fails the gate
        (3L, good, "web", ts("2024-01-01 10:07:00")),  // exact dup of 1 → dropped
        (4L, good + " extra", "web", ts("2024-01-01 10:20:00")))
      q.processAllAvailable()
      // advance the watermark far enough to close the 10:00 window
      input.addData((5L, good + " later", "web", ts("2024-01-01 12:30:00")))
      q.processAllAvailable()

      val rows = spark.table("ingest")
        .select(col("window_start").cast("string"), col("source"),
          col("total_tokens"), col("n_docs"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      // 10:00 window: docs 1 (12 tokens) + 4 (13 tokens); junk and the dup gone
      assert(rows.toSet === Set(("2024-01-01 10:00:00", "web", 25L, 2L)))
    } finally q.stop()
  }

  test("batch/stream unified: the same composition over a batch frame agrees") {
    val batch = Seq(
      (1L, good, "web", ts("2024-01-01 10:05:00")),
      (2L, junk, "web", ts("2024-01-01 10:06:00")),
      (3L, good, "web", ts("2024-01-01 10:07:00")),
      (4L, good + " extra", "web", ts("2024-01-01 10:20:00")))
      .toDF("doc_id", "text", "source", "ingest_ts")
    val r = DocIngest.curatedTokenCounts(batch)
      .select(col("window_start").cast("string"), col("source"),
        col("total_tokens"), col("n_docs"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(r.toSet === Set(("2024-01-01 10:00:00", "web", 25L, 2L)))
  }
}
