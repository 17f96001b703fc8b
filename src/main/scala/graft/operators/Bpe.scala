package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding merge training (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units") — the
  * tokenizer-construction step of a training-data pipeline, run as an
  * iterative Spark job like [[Dedup.duplicateClusters]]:
  *
  *  1. ONE corpus pass aggregates the word-frequency dictionary — after
  *     this, every iteration works on the vocabulary (thousands of rows),
  *     never the corpus. This is the published algorithm's structure: BPE
  *     trains on word counts, and it is what makes training tractable at
  *     100 TB (the corpus is touched once; the loop's shuffles carry
  *     (pair, freq) rows bounded by vocab size).
  *  2. Each iteration: count adjacent symbol pairs weighted by word
  *     frequency (one agg), take the most frequent pair (count desc,
  *     lexicographic tiebreak — deterministic), merge it in every word
  *     (map-only), `localCheckpoint` to keep the plan constant-size
  *     across iterations (the [[Dedup.duplicateClusters]] lesson).
  *
  * Training stops early when no pair repeats (max count < 2 — merging a
  * unique pair memorizes a word, not a unit).
  */
object Bpe {

  /** End-of-word marker symbol (its own symbol, never merged into by
    * accident — words as character sequences end with it, per the paper).
    */
  val EndOfWord = "</w>"

  /** The learned table: merge `step` joins (`left`, `right`) → `left+right`. */
  final case class Merge(step: Int, left: String, right: String)

  private def mergeOnce(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2 // left-to-right, non-overlapping
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Fit-once cache for merge tables — the [[graft.operators.Similarity]]
    * quantizerCache convention: a production tokenizer trains ONCE per
    * corpus and every consumer (gate, encode, vocab) deploys the same
    * table. Keyed by the caller-supplied corpus identity PLUS a content
    * fingerprint of the text column (count + bit_xor of xxhash64 — the
    * ensureIndex convention), so a dataset regenerated under the same
    * path within one JVM re-trains instead of silently serving the old
    * table. Entries are nMerges pairs of short strings — negligible.
    */
  private val mergeCache =
    scala.collection.concurrent.TrieMap.empty[(String, String, Int), Seq[Merge]]

  /** [[learnMerges]] through the per-JVM fit-once memo. The fingerprint
    * pass is one narrow map-side-combined scan of the text column —
    * noise next to the training it guards, and the price of a cache that
    * can never go stale.
    */
  def learnMergesCached(docs: DataFrame, textCol: String, nMerges: Int,
      corpusId: String): Seq[Merge] = {
    val agg = docs.select(xxhash64(col(textCol)).as("h"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("fp"))
      .first()
    val fp = if (agg.isNullAt(1)) 0L else agg.getLong(1)
    val key = f"$corpusId%s/n${agg.getLong(0)}%d_x$fp%016x"
    mergeCache.getOrElseUpdate((key, textCol, nMerges),
      learnMerges(docs, textCol, nMerges))
  }

  /** Learn up to `nMerges` merges from the corpus' whitespace words. */
  def learnMerges(docs: DataFrame, textCol: String, nMerges: Int): Seq[Merge] = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(nMerges > 0, "nMerges must be positive")

    // the one corpus-wide pass: word-frequency dictionary
    var words: Dataset[(Seq[String], Long)] = docs
      .select(explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .as[(String, Long)]
      .map { case (w, f) => ((w.map(_.toString) :+ EndOfWord): Seq[String], f) }
      .localCheckpoint()

    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var step = 1
    var done = false
    while (step <= nMerges && !done) {
      val best = words
        .flatMap { case (s, f) => s.zip(s.tail).map { case (a, b) => (a, b, f) } }
        .toDF("a", "b", "freq")
        .groupBy("a", "b").agg(sum("freq").as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .head(1)
      if (best.isEmpty || best.head.getAs[Long]("n") < 2) done = true
      else {
        val (a, b) = (best.head.getString(0), best.head.getString(1))
        merges += Merge(step, a, b)
        words = words
          .map { case (s, f) => (mergeOnce(s, a, b), f) }
          .localCheckpoint()
        step += 1
      }
    }
    merges.toSeq
  }

  /** Corpus-weighted subword-unit histogram — the vocabulary report a
    * tokenizer trainer emits. One corpus pass builds the word-frequency
    * dictionary (the same aggregation [[learnMerges]] starts from); the
    * merges then replay over the DISTINCT words only, so the segmentation
    * work is vocab-sized, never corpus-sized — at 100 TB the corpus is
    * touched once and the explode carries units-per-distinct-word rows.
    */
  def vocabulary(docs: DataFrame, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ordered = merges.sortBy(_.step).map(m => (m.left, m.right))
    docs.select(explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .as[(String, Long)]
      .flatMap { case (w, f) =>
        var syms: Seq[String] = w.map(_.toString) :+ EndOfWord
        ordered.foreach { case (a, b) => syms = mergeOnce(syms, a, b) }
        syms.map(u => (u, f))
      }
      .toDF("unit", "freq")
      .groupBy("unit").agg(sum("freq").as("n"))
  }

  /** Apply a learned merge table to the corpus: each word re-segmented by
    * replaying the merges in order (map-only — the table ships as a task
    * closure, exactly how a trained tokenizer deploys). Returns
    * (id, tokens) with subword units, end-of-word markers attached.
    */
  def segment(docs: DataFrame, textCol: String, idCol: String,
      merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ordered = merges.sortBy(_.step).map(m => (m.left, m.right))
    docs.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        // natural-language words repeat heavily: memoize the per-WORD
        // merge fold within the task, so each distinct word pays the
        // replay once and every later occurrence is a map hit
        val memo = scala.collection.mutable.HashMap.empty[String, Array[String]]
        def encode(w: String): Array[String] = memo.getOrElseUpdate(w, {
          var syms: Seq[String] = w.map(_.toString) :+ EndOfWord
          ordered.foreach { case (a, b) => syms = mergeOnce(syms, a, b) }
          syms.toArray
        })
        rows.map { case (id, text) =>
          val toks = text.trim.split("\\s+").filter(_.nonEmpty).flatMap(encode)
          (id, toks.toSeq)
        }
      }
      .toDF("doc_id", "tokens")
  }
}
