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
  * checkpoint: a replayed batchId re-runs the same work, and PER-SINK
  * batch_id replay guards (skip each append whose batchId already landed
  * in THAT sink) keep the re-run from double-appending even when a crash
  * falls between the two appends — the documented Spark recipe for
  * idempotent foreachBatch sinks, done per sink because two parquet jobs
  * never commit atomically together.
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
    * digest, append survivors (stamped with their batch_id) + their
    * digests.
    *
    * Exactly-once: the corpus and digest appends are two separate parquet
    * jobs that cannot commit atomically together, so EACH sink carries
    * batch_id and keeps its own replay guard. A crash between the two
    * appends replays into "corpus has this batch, digest does not": the
    * corpus append is skipped, and the digest append — recomputed from
    * the same pre-batch digest state the crashed attempt saw, hence
    * row-identical — completes the pair. A single shared guard on the
    * digest (the previous form) left that window re-appending the corpus.
    */
  def processBatch(batch: DataFrame, batchId: Long, corpusPath: String,
      digestPath: String): Unit = {
    val spark = batch.sparkSession
    // a hard crash mid-FIRST-append can leave the directory with only
    // _temporary debris — read.parquet then throws "unable to infer
    // schema", which must mean "nothing landed", not a crash-looping
    // replay guard (same contract as IndexIngest.processBatch)
    def landed(path: String): Boolean =
      exists(spark, path) &&
        (try !spark.read.parquet(path).filter(col("batch_id") === batchId).isEmpty
         catch { case _: org.apache.spark.sql.AnalysisException => false })
    val corpusHas = landed(corpusPath)
    val digestHas = landed(digestPath)
    if (corpusHas && digestHas) return // full replay of a landed batch

    val hashed = batch.withColumn("content_md5", md5(col("text").cast("binary")))
      // a batch can carry its own internal dups: keep the smallest id
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("content_md5")).orderBy(col("doc_id"))))
      .filter(col("__rk") === 1).drop("__rk")

    // the digest never contains this batch here (digest is written LAST,
    // and a landed digest short-circuits above), so the anti-join state
    // is the pre-batch history on first run and replay alike; the same
    // _temporary-debris case as `landed` means "no history yet"
    val history =
      if (exists(spark, digestPath))
        try Some(spark.read.parquet(digestPath).select("content_md5"))
        catch { case _: org.apache.spark.sql.AnalysisException => None }
      else None
    val survivors = history match {
      case Some(h) => hashed.join(h, Seq("content_md5"), "left_anti")
      case None    => hashed
    }

    if (!corpusHas)
      survivors.drop("content_md5").withColumn("batch_id", lit(batchId))
        .write.mode("append").parquet(corpusPath)
    if (!digestHas)
      survivors.select(col("content_md5"), lit(batchId).as("batch_id"))
        .write.mode("append").parquet(digestPath)
  }

  /** Existence through the Hadoop FileSystem of the path's scheme — a
    * java.io.File test is local-only and silently false on hdfs:///s3a://.
    */
  private def exists(spark: org.apache.spark.sql.SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }
}
