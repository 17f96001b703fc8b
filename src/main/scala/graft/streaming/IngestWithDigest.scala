package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming ingestion against a PERSISTENT dedup digest — the foreachBatch
  * pattern a production pipeline deploys when arriving documents must be
  * deduplicated against the WHOLE HISTORY, not just the watermark span
  * (which is all `dropDuplicatesWithinWatermark` state can hold):
  *
  * per micro-batch, transactionally per batchId:
  *   1. anti-join the batch's content digests against the digest TABLE on
  *      disk (broadcast of the batch side's digests — the batch is small,
  *      the history is not),
  *   2. append survivors to the corpus sink,
  *   3. append the survivors' digests to the digest table.
  *
  * foreachBatch gives exactly-once per-batch semantics through the
  * checkpoint: a replayed batchId re-runs the same work, and the
  * `idempotentAppend` guard (skip if this batchId already landed) keeps
  * the re-run from double-appending — the documented Spark recipe for
  * idempotent foreachBatch sinks.
  *
  * At 100 TB the digest table is (md5, batch_id) — ~48 bytes a document,
  * orders of magnitude smaller than the corpus; the per-batch anti-join
  * reads it once. The bloom-prefiltered arm of
  * [[graft.operators.Dedup.incrementalDedupFlags]] drops in when even
  * that read needs cutting.
  */
object IngestWithDigest {

  /** Run the stream: each micro-batch is deduped against (and then added
    * to) the digest table at `digestPath`; survivors append to
    * `corpusPath`. Returns the started query (caller stops it).
    */
  def start(docs: DataFrame, corpusPath: String, digestPath: String,
      checkpoint: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, corpusPath, digestPath)
      }
      .start()

  /** One micro-batch, callable from tests directly: dedup against the
    * digest, append survivors + their digests. Idempotent per batchId.
    */
  def processBatch(batch: DataFrame, batchId: Long, corpusPath: String,
      digestPath: String): Unit = {
    val spark = batch.sparkSession
    val hashed = batch.withColumn("content_md5", md5(col("text").cast("binary")))
      // a batch can carry its own internal dups: keep the smallest id
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("content_md5")).orderBy(col("doc_id"))))
      .filter(col("__rk") === 1).drop("__rk")

    val digestExists = new java.io.File(digestPath).exists()
    if (digestExists &&
        !spark.read.parquet(digestPath)
          .filter(col("batch_id") === batchId).isEmpty) {
      return // this batchId already landed — replay after a crash, skip
    }
    val survivors =
      if (digestExists)
        hashed.join(spark.read.parquet(digestPath).select("content_md5"),
          Seq("content_md5"), "left_anti")
      else hashed

    survivors.drop("content_md5")
      .write.mode("append").parquet(corpusPath)
    survivors.select(col("content_md5"), lit(batchId).as("batch_id"))
      .write.mode("append").parquet(digestPath)
  }
}
