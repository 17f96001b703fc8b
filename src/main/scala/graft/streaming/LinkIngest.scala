package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.functions.{HtmlTextColumn, Url}

/** Streamed LINK-GRAPH ingest — the edge-table half of the crawl loop,
  * accumulated as segments arrive: each micro-batch of parsed pages
  * appends (a) its canonical page URLs and (b) its canonical
  * (src_url, dst_url) anchor pairs, both PURE MAP-SIDE derivations (one
  * regexp pass for hrefs, column-only canonicalization — no join, no
  * shuffle at append time). Resolution happens at READ time:
  * [[edges]] joins the accumulated pairs against the accumulated URL
  * table, so a link captured BEFORE its target page is discovered is
  * simply unresolved until a later segment lands the target — real
  * crawl-frontier semantics, and the reason appends must not resolve.
  *
  * This ordering makes the end state equal to batch extraction over the
  * full archive (`SparkEntry.warcLinkEdges`): accumulated-distinct pairs
  * resolved against accumulated URLs ≡ whole-corpus pairs resolved
  * against the whole-corpus URL table — which is what lets
  * `warc_links_streamed` share `warc_links`' oracle verbatim (the
  * equivalence-twin convention).
  *
  * Exactly-once: both sinks follow [[BatchMarker]] (markers AFTER each
  * append, partial dirs cleared and rewritten on replay), with
  * `_batches_has_data` sentinels keeping the "does the table exist yet"
  * checks O(1), marker→sentinel crash windows repaired at the top of the
  * next call — the [[PhashIngest]] two-sink protocol verbatim.
  */
object LinkIngest {

  /** Run the stream over parsed pages (the `Warc.httpParsed` shape:
    * `uri`, `http_status`, `body`). Returns the started query.
    */
  def start(pages: DataFrame, indexPath: String,
      checkpoint: String): StreamingQuery =
    pages.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, indexPath)
      }
      .start()

  /** One micro-batch, callable from tests and backfills directly. */
  def processBatch(pages: DataFrame, batchId: Long, indexPath: String): Unit = {
    val spark = pages.sparkSession
    val urlsPath = s"$indexPath/urls"
    val pairsPath = s"$indexPath/pairs"
    BatchMarker.assertMarkeredSink(spark, indexPath, s"$urlsPath/batch_id=*")
    BatchMarker.assertMarkeredSink(spark, indexPath, s"$pairsPath/batch_id=*")
    BatchMarker.ensureProtocol(spark, indexPath)
    val pairsHas = BatchMarker.landed(spark, indexPath, "pairs", batchId)
    val urlsHas = BatchMarker.landed(spark, indexPath, "urls", batchId)
    if (pairsHas && !exists(spark, s"$pairsPath/_batches_has_data") &&
        exists(spark, s"$pairsPath/batch_id=$batchId"))
      stamp(spark, s"$pairsPath/_batches_has_data")
    if (urlsHas && !exists(spark, s"$urlsPath/_batches_has_data") &&
        exists(spark, s"$urlsPath/batch_id=$batchId"))
      stamp(spark, s"$urlsPath/_batches_has_data")
    if (pairsHas && urlsHas) return
    if (!pairsHas) BatchMarker.clearPartial(spark, s"$pairsPath/batch_id=$batchId")
    if (!urlsHas) BatchMarker.clearPartial(spark, s"$urlsPath/batch_id=$batchId")
    if (pages.isEmpty) {
      if (!pairsHas) BatchMarker.commit(spark, indexPath, "pairs", batchId)
      if (!urlsHas) BatchMarker.commit(spark, indexPath, "urls", batchId)
      return
    }

    if (!pairsHas) {
      // anchors from this batch's 200-status bodies, canonical on both
      // ends, per-batch distinct (the global distinct is the read's job)
      pages.filter(col("http_status") === 200)
        .select(Url.canonicalizeUrl(col("uri")).as("src_url"),
          explode(HtmlTextColumn.hrefs(col("body"))).as("href"))
        .filter(col("src_url").isNotNull)
        .select(col("src_url"), Url.canonicalizeUrl(col("href")).as("dst_url"))
        .filter(col("dst_url").isNotNull)
        .distinct()
        .withColumn("batch_id", lit(batchId))
        .write.mode("append").partitionBy("batch_id").parquet(pairsPath)
      BatchMarker.commit(spark, indexPath, "pairs", batchId)
      if (exists(spark, s"$pairsPath/batch_id=$batchId"))
        stamp(spark, s"$pairsPath/_batches_has_data")
    }
    if (!urlsHas) {
      // every fetched page claims its canonical URL (404s included — a
      // link to a dead page still resolves to a discovered node)
      pages.select(Url.canonicalizeUrl(col("uri")).as("url"))
        .filter(col("url").isNotNull)
        .distinct()
        .withColumn("batch_id", lit(batchId))
        .write.mode("append").partitionBy("batch_id").parquet(urlsPath)
      BatchMarker.commit(spark, indexPath, "urls", batchId)
      if (exists(spark, s"$urlsPath/batch_id=$batchId"))
        stamp(spark, s"$urlsPath/_batches_has_data")
    }
  }

  /** The resolved edge table over everything accumulated so far: distinct
    * pairs joined against the distinct discovered-URL table. Pairs whose
    * target is still undiscovered stay out — they resolve the moment a
    * later segment lands the target URL. Empty typed frame before any
    * data-bearing batch.
    *
    * `nodeOf` maps a canonical URL to its node id; the default hashes the
    * URL (`xxhash64` — collision odds negligible against web-graph
    * sizes), and a caller whose URL scheme carries a natural id (the test
    * fixture's path ids) passes its own extractor.
    */
  def edges(spark: SparkSession, indexPath: String,
      upToBatch: Option[Long] = None,
      nodeOf: Column => Column = xxhash64(_)): DataFrame = {
    import spark.implicits._
    if (!exists(spark, s"$indexPath/pairs/_batches_has_data") ||
        !exists(spark, s"$indexPath/urls/_batches_has_data"))
      return Seq.empty[(Long, Long)].toDF("src", "dst")
    // `upToBatch` is the TIME-TRAVEL read: the edge table as of segment
    // N — batch_id is the hive partition column on both tables, so the
    // bound prunes to the surviving early directories (the readAsOf
    // posture), which is what a crawl-cadence refresh diffs against
    def asOf(df: DataFrame) =
      upToBatch.fold(df)(b => df.filter(col("batch_id") <= b))
    val urls = asOf(spark.read.parquet(s"$indexPath/urls"))
      .select(col("url").as("dst_url")).distinct()
      .withColumn("dst", nodeOf(col("dst_url")))
    asOf(spark.read.parquet(s"$indexPath/pairs"))
      .select(col("src_url"), col("dst_url")).distinct()
      .join(urls, Seq("dst_url"))
      .select(nodeOf(col("src_url")).as("src"), col("dst"))
      .distinct()
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
