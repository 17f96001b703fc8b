package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{Dedup, Multimodal}

/** Streamed IMAGE dedup ingest — the multimodal twin of
  * [[IngestWithDigest]]: encoded images arrive in micro-batches, each
  * batch is decoded → perceptually hashed ([[Multimodal.imageDHash]]) →
  * near-dup-paired against the WHOLE accumulated signature index
  * ([[Dedup.hammingPairsHiLoIncremental]] — new-new and new-old pairs
  * only, the old-old quadratic term never forms), and then the batch's
  * signatures join the index. What a crawl pipeline runs when every day's
  * images must be deduplicated against all of history without ever
  * re-hashing or re-pairing it.
  *
  * Layout under `indexPath`:
  *   - `sigs/batch_id=<b>/`  — (doc_id, hash_hi, hash_lo): 3 longs per
  *     image, orders of magnitude smaller than the payload corpus (the
  *     digest-table posture), read once per batch as the probe target;
  *   - `pairs/batch_id=<b>/` — (doc_a, doc_b, hamming): the batch's
  *     incremental pair emission. Because batch b's emission is exactly
  *     "pairs touching b against everything ≤ b", the UNION over all
  *     batches is exactly the all-pairs set over the accumulated corpus,
  *     each pair exactly once (in the batch of its LATER member) — which
  *     is what lets one brute-force oracle verify the whole accumulation.
  *
  * Exactly-once: both sinks follow the [[BatchMarker]] protocol (per-sink
  * markers written AFTER each append commits, partial batch dirs cleared
  * and rewritten on replay). Pairs are computed from the PRE-batch
  * signature state and the signature append commits LAST, so every replay
  * window recomputes an identical pair set: a crash before the pairs
  * marker rewrites pairs from unchanged inputs; one after it skips pairs
  * and completes the signature append. `_batches/has_data` sentinels keep
  * the "does history/output exist yet" checks O(1) (never a batch_id=*
  * listing), with the marker→sentinel crash window repaired at the top of
  * the next call, exactly as [[IngestWithDigest]] does.
  *
  * Caller contract (matching [[Dedup.hammingPairsHiLoIncremental]]):
  * batches carry disjoint media_ids — an id belongs to the batch that
  * first delivers it.
  */
object PhashIngest {

  /** Run the stream: each micro-batch of (media_id, payload, media_type)
    * rows is hashed, paired against the accumulated index and appended to
    * it. Returns the started query (caller stops it).
    */
  def start(media: DataFrame, indexPath: String, checkpoint: String,
      maxHamming: Int = 3, bands: Int = 4): StreamingQuery =
    media.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, indexPath, maxHamming, bands)
      }
      .start()

  /** One micro-batch, callable from tests and backfills directly. */
  def processBatch(media: DataFrame, batchId: Long, indexPath: String,
      maxHamming: Int = 3, bands: Int = 4): Unit = {
    val spark = media.sparkSession
    val sigsPath = s"$indexPath/sigs"
    val pairsPath = s"$indexPath/pairs"
    BatchMarker.assertMarkeredSink(spark, indexPath, s"$sigsPath/batch_id=*")
    BatchMarker.assertMarkeredSink(spark, indexPath, s"$pairsPath/batch_id=*")
    BatchMarker.ensureProtocol(spark, indexPath)
    val pairsHas = BatchMarker.landed(spark, indexPath, "pairs", batchId)
    val sigsHas = BatchMarker.landed(spark, indexPath, "sigs", batchId)
    // repair the marker→sentinel crash window BEFORE any short-circuit
    // (each sink's marker commits first, its has_data sentinel second)
    if (pairsHas && !exists(spark, s"$pairsPath/_batches_has_data") &&
        exists(spark, s"$pairsPath/batch_id=$batchId"))
      stamp(spark, s"$pairsPath/_batches_has_data")
    if (sigsHas && !exists(spark, s"$sigsPath/_batches_has_data") &&
        exists(spark, s"$sigsPath/batch_id=$batchId"))
      stamp(spark, s"$sigsPath/_batches_has_data")
    if (pairsHas && sigsHas) return // full replay of a landed batch
    if (!pairsHas)
      BatchMarker.clearPartial(spark, s"$pairsPath/batch_id=$batchId")
    if (!sigsHas)
      BatchMarker.clearPartial(spark, s"$sigsPath/batch_id=$batchId")
    if (media.isEmpty) { // sources can advance offsets with no rows
      if (!pairsHas) BatchMarker.commit(spark, indexPath, "pairs", batchId)
      if (!sigsHas) BatchMarker.commit(spark, indexPath, "sigs", batchId)
      return
    }

    // decode once per batch: both the pair emission and the index append
    // consume these rows. Corrupt payloads decode=false and are dropped
    // HERE — they can neither pair nor poison the index.
    val batchSigs = Multimodal.imageDHash(media).toDF()
      .filter(col("decoded"))
      .select(col("media_id").as("doc_id"), col("hash_hi"), col("hash_lo"))
      .persist()
    try {
      // "history exists" is the O(1) sentinel, stamped only when a
      // signature append lands actual rows — never a dir listing
      val existing =
        if (exists(spark, s"$sigsPath/_batches_has_data"))
          spark.read.parquet(sigsPath)
            .select(col("doc_id"), col("hash_hi"), col("hash_lo"))
        else batchSigs.limit(0)
      if (!pairsHas) {
        Dedup.hammingPairsHiLoIncremental(existing, batchSigs,
            maxHamming, bands)
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").partitionBy("batch_id").parquet(pairsPath)
        BatchMarker.commit(spark, indexPath, "pairs", batchId)
        if (exists(spark, s"$pairsPath/batch_id=$batchId"))
          stamp(spark, s"$pairsPath/_batches_has_data")
      }
      if (!sigsHas) {
        batchSigs.withColumn("batch_id", lit(batchId))
          .write.mode("append").partitionBy("batch_id").parquet(sigsPath)
        BatchMarker.commit(spark, indexPath, "sigs", batchId)
        if (exists(spark, s"$sigsPath/batch_id=$batchId"))
          stamp(spark, s"$sigsPath/_batches_has_data")
      }
    } finally batchSigs.unpersist()
  }

  /** The accumulated pair table (empty-but-typed if no batch has emitted
    * pairs yet — a table that never materialized a partition dir cannot
    * be read back, so the sentinel gates the read).
    */
  def readPairs(spark: SparkSession, indexPath: String): DataFrame = {
    import spark.implicits._
    if (exists(spark, s"$indexPath/pairs/_batches_has_data"))
      spark.read.parquet(s"$indexPath/pairs")
        .select(col("doc_a"), col("doc_b"), col("hamming"))
    else
      Seq.empty[(Long, Long, Long)].toDF("doc_a", "doc_b", "hamming")
  }

  /** The accumulated signature index (empty-but-typed before any rows). */
  def readSigs(spark: SparkSession, indexPath: String): DataFrame = {
    import spark.implicits._
    if (exists(spark, s"$indexPath/sigs/_batches_has_data"))
      spark.read.parquet(s"$indexPath/sigs")
        .select(col("doc_id"), col("hash_hi"), col("hash_lo"))
    else
      Seq.empty[(Long, Long, Long)].toDF("doc_id", "hash_hi", "hash_lo")
  }

  private def stamp(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) { fs.mkdirs(p.getParent); fs.create(p, true).close() }
  }

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }
}
