package graft.streaming

import graft.operators.Retrieval
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming maintenance of the BM25 inverted index — the foreachBatch
  * companion to [[graft.operators.Retrieval]]: each arriving micro-batch
  * of documents appends its OWN postings and doc-length partitions to the
  * index tables on disk. Because batches are doc-disjoint, per-(token,
  * doc) counts from different batches never collide, so maintenance is a
  * pure append — no read-modify-write of the index, no rebuild (the
  * contract the `text_bm25_incremental` driver row proves in batch form:
  * a search over unioned batch indexes equals a search over the one-shot
  * index). Corpus-level statistics (df, N, avgdl) are derived at SEARCH
  * time from the accumulated tables, so they are always current without
  * any maintained aggregate.
  *
  * Exactly-once per batchId, the [[IngestWithDigest]] recipe: the two
  * parquet appends cannot commit atomically together, so EACH table
  * carries batch_id and keeps its own replay guard — a crash between the
  * appends replays into "doclens has this batch, postings does not", the
  * doclens append is skipped and the postings append completes the pair.
  * Until the replay lands, [[bm25TopK]] restricts itself to batches
  * present in BOTH tables — an orphaned half must not even skew the
  * derived n_docs/avgdl statistics, let alone score.
  *
  * At 100 TB each batch lands as its own partition files; the
  * [[graft.sinks.Compaction]] pass coalesces small batch files, and a
  * token-bucketed rewrite remains the read-path optimization exactly as
  * in the batch-built index.
  */
object IndexIngest {

  /** Run the stream: each micro-batch's postings/doclens append to
    * `indexPath`. Returns the started query (caller stops it).
    */
  def start(docs: DataFrame, indexPath: String, checkpoint: String,
      textCol: String = "text", idCol: String = "doc_id"): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, indexPath, textCol, idCol)
      }
      .start()

  /** One micro-batch, callable from tests directly. */
  def processBatch(batch: DataFrame, batchId: Long, indexPath: String,
      textCol: String = "text", idCol: String = "doc_id"): Unit = {
    val spark = batch.sparkSession
    // a hard crash mid-FIRST-append can leave the directory with only
    // _temporary debris — read.parquet then throws "unable to infer
    // schema", which must mean "nothing landed", not a crash-looping
    // replay guard
    def landed(path: String): Boolean =
      exists(spark, path) &&
        (try !spark.read.parquet(path).filter(col("batch_id") === batchId).isEmpty
         catch { case _: org.apache.spark.sql.AnalysisException => false })
    val postingsPath = s"$indexPath/postings"
    val doclensPath = s"$indexPath/doclens"
    val postingsHas = landed(postingsPath)
    val doclensHas = landed(doclensPath)
    if (postingsHas && doclensHas) return // full replay of a landed batch

    val (postings, doclens) = Retrieval.invertedIndex(batch, textCol, idCol)
    if (!doclensHas)
      doclens.withColumn("batch_id", lit(batchId))
        .write.mode("append").parquet(doclensPath)
    if (!postingsHas)
      postings.withColumn("batch_id", lit(batchId))
        .write.mode("append").parquet(postingsPath)
  }

  /** Search the accumulated index: same scorer as the batch path — the
    * tables just happen to have been written one batch at a time.
    *
    * Only FULLY-landed batches participate: a crash between the two
    * appends leaves one table with a batch the other lacks, and while the
    * orphan docs could never score (search drives from postings ⨝
    * doclens), an orphaned doclens half would still skew the derived
    * n_docs/avgdl corpus statistics — so both reads filter to the batch
    * ids present in BOTH tables (a distinct over the handful of batch
    * ids, collected driver-side).
    */
  def bm25TopK(spark: org.apache.spark.sql.SparkSession, indexPath: String,
      queries: DataFrame, k: Int): DataFrame = {
    val postingsRaw = spark.read.parquet(s"$indexPath/postings")
    val doclensRaw = spark.read.parquet(s"$indexPath/doclens")
    // the intersection stays IN the plan as a broadcast semi-join (batch
    // ids are a handful of rows) — no eager driver-side scans per search
    val complete = broadcast(
      postingsRaw.select(col("batch_id")).distinct()
        .join(doclensRaw.select(col("batch_id")).distinct(), Seq("batch_id")))
    val postings = postingsRaw
      .join(complete, Seq("batch_id"), "left_semi")
      .select(col("token"), col("doc_id"), col("tf"))
    val doclens = doclensRaw
      .join(complete, Seq("batch_id"), "left_semi")
      .select(col("doc_id"), col("dl"))
    Retrieval.bm25TopK(postings, doclens, queries, k)
  }

  private def exists(spark: org.apache.spark.sql.SparkSession,
      path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }
}
