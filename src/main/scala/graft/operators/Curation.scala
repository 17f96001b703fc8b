package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for the LLM-data-pipeline surface: rule-based
  * quality gates, reproducible subsampling, per-source caps and repeated-span
  * statistics. These are the passes a 100 TB training-data build runs between
  * ingestion and tokenization; all of them are single-shuffle-or-less and
  * whole-stage-codegen friendly (builtin expressions only, no UDFs).
  */
object Curation {

  /** Md5-derived uniform fraction in [0, 1) for a key column — the portable
    * reproducible-sampling primitive. Hash-based sampling (rather than RNG
    * `sample()`) is how large pipelines subsample: the decision for a row is
    * a pure function of its key, so re-runs, retries and incremental builds
    * all agree on which rows are in. The md5 hex prefix gives 60 bits; any
    * engine with md5 reproduces the fraction bit-for-bit (same construction
    * as the portable SimHash in [[Dedup.simhashBuckets]]).
    */
  def hashFraction(key: Column): Column =
    conv(substring(md5(key.cast("string").cast("binary")), 1, 15), 16, 10)
      .cast("long").cast("double") / lit((1L << 60).toDouble)

  /** Deterministic subsample: keep rows whose [[hashFraction]] over `idCol`
    * is below `fraction`. Map-only — no shuffle, no RNG state, stable across
    * cluster layouts and re-runs.
    */
  def sampleByHash(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    df.filter(hashFraction(col(idCol)) < fraction)

  /** Per-source document cap — the "per-domain cap" of web-corpus builds
    * (a handful of giant sources must not dominate the training mix). Keeps
    * at most `cap` documents per `sourceCol` value, chosen by hash order
    * (deterministic, unbiased by ingestion order) with the id as tiebreak.
    *
    * One shuffle on the source key. Source cardinality is typically millions
    * (domains), so the window partitions are small and skew-free; a
    * degenerate single-source corpus degrades to a single partition, which
    * is exactly the case where a cap this small means the output is tiny
    * anyway.
    */
  def perSourceCap(df: DataFrame, idCol: String, sourceCol: String, cap: Int): DataFrame = {
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(hashFraction(col(idCol)), col(idCol))
    df.withColumn("sample_rank", row_number().over(w).cast("bigint"))
      .filter(col("sample_rank") <= cap)
  }

  /** Gopher-style rule-based quality flags (Rae et al. 2021, §A1.1.1 — the
    * published heuristics, re-expressed as codegen'd columns): word count
    * bounds, mean word length bounds, alphabetic-word ratio, minimum
    * stopword hits. Emits the measurements AND the individual flags so a
    * pipeline can tune thresholds without recomputing; `quality_pass` is the
    * conjunction. Pure map-side — zero shuffle.
    */
  def gopherFlags(
      docs: DataFrame, textCol: String, idCol: String,
      stopwords: Seq[String] = Seq("the", "be", "to", "of", "and", "that", "have", "with"),
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      minAlphaRatio: Double = 0.8, minStopwordHits: Int = 2): DataFrame = {
    val words = split(trim(col(textCol)), "\\s+")
    docs
      .select(col(idCol).as("doc_id"), words.as("words"))
      .select(
        col("doc_id"),
        size(col("words")).cast("bigint").as("n_words"),
        // mean word length over the whitespace tokens; 0 tokens → null
        (aggregate(col("words"), lit(0L), (acc, w) => acc + length(w)).cast("double") /
          size(col("words"))).as("mean_word_len_raw"),
        (size(filter(col("words"), w => w.rlike("[a-zA-Z]"))).cast("double") /
          size(col("words"))).as("alpha_ratio_raw"),
        size(filter(col("words"), w =>
          array_contains(typedLit(stopwords), w))).cast("bigint").as("stopword_hits"))
      .select(
        col("doc_id"), col("n_words"),
        round(col("mean_word_len_raw"), 4).as("mean_word_len"),
        round(col("alpha_ratio_raw"), 4).as("alpha_ratio"),
        col("stopword_hits"),
        col("n_words").between(minWords, maxWords).as("flag_word_count"),
        col("mean_word_len_raw").between(minMeanWordLen, maxMeanWordLen).as("flag_mean_word_len"),
        (col("alpha_ratio_raw") >= minAlphaRatio).as("flag_alpha_ratio"),
        (col("stopword_hits") >= minStopwordHits).as("flag_stopwords"))
      .withColumn("quality_pass",
        col("flag_word_count") && col("flag_mean_word_len") &&
          col("flag_alpha_ratio") && col("flag_stopwords"))
  }

  /** Per-document repeated-span statistics — the substring-level dedup
    * signal of "Deduplicating Training Data Makes Language Models Better"
    * (Lee et al. 2021), at word n-gram granularity: a span is "duplicated"
    * when its n-gram occurs in at least `minDocs` DISTINCT documents.
    * Reports, per document, how many of its distinct spans are
    * corpus-duplicated and the ratio — the score a removal/trim pass
    * thresholds on.
    *
    * Cost shape: one explode + one aggregation on the span key (map-side
    * combine collapses each document's duplicate spans before the shuffle),
    * then one co-partitioned join back. No all-pairs anything; at 100 TB the
    * shuffle carries O(total distinct spans) narrow rows. The span table
    * reuses [[Dedup.shingled]], so the tokenizer stays a bound attribute
    * (perf trap: re-inlined regex).
    */
  def repeatedSpanStats(
      docs: DataFrame, textCol: String, idCol: String,
      n: Int, minDocs: Int): DataFrame = {
    val sh = Dedup.shingled(Dedup.spread(docs, idCol), textCol, idCol, n)
    val ex = sh.select(col("doc_id"), explode(col("shingles")).as("span"))
    // distinct-doc count per span; shingles are distinct within a doc, so
    // count(*) IS the distinct-document frequency — no countDistinct needed
    val hot = ex.groupBy(col("span")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDocs)
      .select(col("span"))
    val perDoc = ex.join(hot, Seq("span"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup_spans"))
    sh.select(col("doc_id"), size(col("shingles")).cast("bigint").as("n_spans"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("n_spans"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        when(col("n_spans") > 0,
          round(coalesce(col("n_dup_spans"), lit(0L)).cast("double") / col("n_spans"), 6))
          .otherwise(lit(0.0)).as("dup_ratio"))
  }
}
