package graft.operators

import graft.functions.TextStats
import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for the LLM-data-pipeline surface (builder brief;
  * reference analog: the duplicates audit at
  * /root/reference/notebooks/duplicates.ipynb cells 11,14 — group by DOI,
  * count records / distinct rounds / distinct titles).
  *
  * Scale stance: every variant here is bucketed — exact dedup shuffles once
  * on a 128-bit content hash; MinHash/SimHash shuffle on band keys. There is
  * deliberately NO all-pairs path: candidate pairs only ever materialize
  * within a bucket, so a 1000-executor run over 100 TB shuffles O(docs)
  * rows, not O(docs²).
  */
object Dedup {

  /** Exact dedup: group on md5(text). One shuffle, map-side partial
    * aggregation, keeper = min id (deterministic).
    */
  def exactGroups(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs
      .groupBy(md5(col(textCol)).as("text_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keeper_id"))

  /** Exact dedup keeping one row per content hash (the "apply" form). */
  def dropExactDuplicates(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    docs.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** Word n-gram shingles of the normalized token stream — the unit both
    * Jaccard variants operate on.
    *
    * Built as two separate projections so the (regex-heavy) tokenizer is a
    * bound attribute inside the shingling lambda, not re-inlined per
    * position — CollapseProject keeps multi-referenced non-cheap aliases
    * un-collapsed. One select would make each `slice(toks, i, n)` recompute
    * the full tokenization: O(len²) regex work per document.
    */
  def shingled(docs: DataFrame, textCol: String, idCol: String, n: Int): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), TextStats.tokenize(col(textCol)).as("toks"))
      .select(
        col("doc_id"),
        // guard: sequence(0, negative) would run DESCENDING and feed slice
        // an invalid 0/negative start for docs shorter than n tokens
        when(size(col("toks")) >= n,
          array_distinct(
            transform(
              sequence(lit(0), size(col("toks")) - n),
              i => array_join(slice(col("toks"), i + 1, lit(n)), " ")
            ))
        ).otherwise(array().cast("array<string>")).as("shingles"))
  // NOTE deliberately NO filter here: a filter above these projections gets
  // predicate-pushed below them with the alias substituted — the whole
  // shingle expression (and any downstream UDFs) lands in a scan-level
  // Filter, evaluated multiple times per row. Callers persist() the shingle
  // table first and filter on the cached relation.

  /** Exact n-gram Jaccard similarity join: explode shingles, equi-join on
    * shingle, count intersections, Jaccard = |∩| / (|A|+|B|-|∩|).
    *
    * This is the verification-grade exact path: it is sub-quadratic only
    * because the shingle space is large (selective join keys). For corpora
    * where shingle frequency is skewed, cap document frequency upstream or
    * use [[minhashCandidates]] — the LSH path — as the 100 TB route.
    */
  def ngramJaccardPairs(
      docs: DataFrame, textCol: String, idCol: String,
      n: Int, threshold: Double): DataFrame = {
    // Materialize the shingle table once, BEFORE any filter/explode: it
    // feeds both join sides and the per-doc size aggregate, and the cache
    // boundary stops predicate pushdown from substituting the shingle
    // expression into scan filters. At scale this would be a written
    // intermediate table; in-session, persist() is its analog.
    val sh = shingled(docs, textCol, idCol, n).persist()
    val toks = sh.select(col("doc_id"), explode(col("shingles")).as("shingle"))
    val sizes = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
    // Rename both sides before the self-join: with shared lineage Spark
    // resolves a.shingle/b.shingle to the SAME attribute, degrades the
    // condition to a trivial filter and plans a nested-loop CROSS join —
    // O(n²) instead of a shuffled equi-join on shingle.
    val ta = toks.select(col("doc_id").as("doc_a"), col("shingle"))
    val tb = toks.select(col("doc_id").as("doc_b"), col("shingle").as("shingle_b"))
    val inter = ta
      .join(tb, col("shingle") === col("shingle_b") && col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_shingles", "size_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_shingles", "size_b"), "doc_b")
      .withColumn("jaccard",
        col("n_inter").cast("double") /
          (col("size_a") + col("size_b") - col("n_inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** MinHash+LSH near-dup candidates via spark.ml: shingles → hashed feature
    * vectors → banded MinHash join at `maxDistance` (Jaccard distance).
    * Seeded → deterministic. This is the scale path: candidates only form
    * inside LSH buckets.
    */
  def minhashCandidates(
      docs: DataFrame, textCol: String, idCol: String,
      n: Int, numHashes: Int, maxDistance: Double): DataFrame = {
    val sh = shingled(docs, textCol, idCol, n).persist()
    val tf = new HashingTF()
      .setInputCol("shingles").setOutputCol("features").setNumFeatures(1 << 18)
    // MinHash requires ≥1 set bit; filter on the cached shingle table.
    // feats is persisted too — approxSimilarityJoin probes it from both
    // sides and its internal explode/filters would otherwise re-run the
    // HashingTF/MinHash UDF chain per pushed-down predicate.
    val feats = tf.transform(sh.filter(size(col("shingles")) > 0)).persist()
    val lsh = new MinHashLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(numHashes).setSeed(42L)
    val model  = lsh.fit(feats)
    val joined = model.approxSimilarityJoin(feats, feats, maxDistance, "dist")
    joined
      .filter(col("datasetA.doc_id") < col("datasetB.doc_id"))
      .select(
        col("datasetA.doc_id").as("doc_a"),
        col("datasetB.doc_id").as("doc_b"),
        round(lit(1.0) - col("dist"), 6).as("est_jaccard"))
  }

  /** SimHash bucketing: 64-bit signature, bucket on the top `bandBits` bits.
    * Near-dups collide in a bucket; intra-bucket verification (hamming or
    * [[graft.functions.PartialRatio]]) follows. Pure map + one group — the
    * cheapest near-dup screen available.
    */
  def simhashBuckets(docs: DataFrame, textCol: String, idCol: String, bandBits: Int): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), TextStats.tokenHashes(col(textCol)).as("thashes"))
      .select(col("doc_id"), TextStats.simhashFromHashes(col("thashes")).as("simhash"))
      .withColumn("bucket", shiftrightunsigned(col("simhash"), 64 - bandBits))
}
