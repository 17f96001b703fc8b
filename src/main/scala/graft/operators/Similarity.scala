package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search (builder brief: ANN over `embeddings.parquet`).
  *
  * Scale stance: [[bruteForceTopK]] is the correctness baseline — an
  * explicit cartesian between a SMALL broadcast query set and the corpus
  * (q × N, map-side only; never N × N). [[lshTopK]] is the scale path:
  * seeded random-hyperplane signatures bucket the corpus so each query only
  * scores its own bucket — the classic SRP-LSH / IVF-style route that keeps
  * the probe cost at N/buckets per query on a 100 TB corpus.
  */
object Similarity {

  /** Cosine similarity between two double-array columns, computed with a
    * sequential fold (`aggregate`) so the summation order — and therefore
    * the IEEE result — is deterministic and oracle-reproducible.
    */
  def cosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    val dot   = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val normA = sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))
    val normB = sqrt(aggregate(transform(b, x => x * x), lit(0.0), (acc, x) => acc + x))
    dot / (normA * normB)
  }

  private def asDouble(c: org.apache.spark.sql.Column) =
    transform(c, x => x.cast("double"))

  /** Brute-force cosine top-k: broadcast the query vectors, score the corpus
    * once, rank per query. Similarity is rounded to 4 dp before ranking with
    * a vec_id tiebreak, making the top-k set deterministic across engines.
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("nvec"))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qvec"))
    val scored = c
      .join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", round(cosine(col("qvec"), col("nvec")), 4))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
  }

  /** Signed-random-projection LSH signature: `bits` seeded hyperplanes, one
    * sign bit each. Deterministic pseudo-random planes derived from
    * xxhash64(seed, plane, dim) — no RNG state, reproducible on any cluster.
    */
  def srpSignature(
      vec: org.apache.spark.sql.Column, dim: Int, bits: Int, seed: Long) = {
    val bitCols = (0 until bits).map { p =>
      // plane component h(p,d) mapped to [-0.5, 0.5)
      val dot = (0 until dim).map { d =>
        val h = xxhash64(lit(seed), lit(p), lit(d))
        (element_at(vec, d + 1).cast("double")) *
          ((h.cast("double") / lit(Long.MaxValue.toDouble)) / 2.0)
      }.reduce(_ + _)
      when(dot >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bitCols.reduce((a, b) => a.bitwiseOR(b))
  }

  /** LSH-bucketed top-k: corpus and queries get SRP signatures; each query
    * scores only corpus rows sharing its bucket. Recall < 1 by construction
    * (trade via `bits`); at scale the bucket join replaces the broadcast
    * cartesian of the brute-force path.
    */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame, k: Int, dim: Int, bits: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      seed: Long = 42L): DataFrame = {
    val sig = (df: DataFrame, id: String, v: String) =>
      df.select(col(idCol).as(id), asDouble(col(vecCol)).as(v),
        srpSignature(col(vecCol), dim, bits, seed).as("bucket"))
    val c = sig(corpus, "neighbor_id", "nvec")
    val q = sig(queries, "query_id", "qvec")
    val scored = c.join(q, Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", round(cosine(col("qvec"), col("nvec")), 4))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
  }
}
