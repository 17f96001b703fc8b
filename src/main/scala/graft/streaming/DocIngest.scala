package graft.streaming

import graft.functions.TextStats
import graft.operators.Curation
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming document ingestion — the curation surface run AS A STREAM:
  * the batch operators this engine already proves correct (Gopher quality
  * rules, exact-dup dropping, token accounting) composed over a readStream
  * of arriving documents. The batch/stream unification is the point: every
  * stage here is the SAME code path the oracled batch queries use (map-only
  * expressions stream as-is; the dedup and aggregation stages swap in their
  * watermarked streaming forms), so batch-verified semantics carry to the
  * streaming deployment.
  *
  * Pipeline: quality gate (map-only, stateless) → exact-dup drop on the
  * content digest within the watermark (state bounded by the watermark, the
  * streaming analog of [[graft.operators.Dedup.exactDups]]'s keep-first) →
  * per-source tumbling-window token accounting (append mode once the
  * watermark closes a window).
  *
  * At scale: stateless stages shard trivially; the dedup state is
  * (digest → seen) per watermark span — bounded by arrival rate × span, not
  * corpus size (cross-history dedup belongs to the batch digest join,
  * [[graft.operators.Dedup.incrementalDedupFlags]], fed by this stream's
  * output); the windowed agg holds one partial row per (source, open
  * window).
  */
object DocIngest {

  /** Stage 1 — stateless quality gate: Gopher word-count / word-length /
    * alpha-ratio / stopword rules, keeping only passing docs. The same
    * measurements and bounds as the oracled `curation_gopher` batch query
    * ([[Curation.gopherPass]] ≡ `gopherFlags(...).quality_pass`, asserted
    * by CurationSpec), applied as a payload-preserving filter.
    */
  def qualityGate(docs: DataFrame, minWords: Int = 5): DataFrame =
    docs.filter(Curation.gopherPass(col("text"),
      stopwords = Seq("the", "a", "and"), minWords = minWords))

  /** Stage 2 — exact dedup on the content digest. Streaming: first arrival
    * wins, later copies inside the watermark are dropped, state expires
    * with the watermark. Batch: plain `dropDuplicates` (keep-any — copies
    * share the digest, so every downstream content aggregate is
    * unaffected by which survives).
    */
  def dedupByContent(docs: DataFrame, watermark: String = "10 minutes"): DataFrame = {
    val d = docs.withColumn("content_md5", md5(col("text").cast("binary")))
    if (d.isStreaming)
      d.withWatermark("ingest_ts", watermark).dropDuplicatesWithinWatermark("content_md5")
    else d.dropDuplicates("content_md5")
  }

  /** Stage 3 — per-source token accounting over tumbling windows: the
    * streaming twin of the (oracled) `text_token_totals` aggregation,
    * emitted per closed window in append mode.
    */
  def tokenAccounting(docs: DataFrame, window_ : String = "1 hour"): DataFrame =
    docs
      .groupBy(window(col("ingest_ts"), window_), col("source"))
      .agg(sum(TextStats.tokenCount(col("text")).cast("bigint")).as("total_tokens"),
        count(lit(1)).as("n_docs"))
      .select(col("window.start").as("window_start"), col("source"),
        col("total_tokens"), col("n_docs"))

  /** The composed ingest stream: gate → dedup → account. Works unchanged on
    * a batch frame (minus the watermark state) — DocIngestSpec runs the
    * same composition both ways and compares.
    */
  def curatedTokenCounts(docs: DataFrame,
      watermark: String = "10 minutes", window_ : String = "1 hour"): DataFrame =
    tokenAccounting(dedupByContent(qualityGate(docs), watermark), window_)
}
