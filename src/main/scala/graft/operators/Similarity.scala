package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
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

  /** Cosine similarity between two double-array columns via the native
    * [[graft.functions.DotProduct]] expression — a sequential primitive
    * fold, so the summation order (and therefore the IEEE result) is
    * deterministic, oracle-reproducible, and codegen-fast.
    */
  def cosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    import graft.functions.VectorOps.dotProduct
    dotProduct(a, b) / (sqrt(dotProduct(a, a)) * sqrt(dotProduct(b, b)))
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

  /** Embedding-cosine near-dup pairs (builder brief: embedding-cosine
    * near-dup as a dedup variant): all pairs above `threshold`, norms
    * precomputed per row so each pair costs one dot product. Exact and
    * oracle-reproducible (rounded before the threshold filter).
    *
    * Scale: this is the verification-grade exact path — O(n²) dot products.
    * The 100 TB route prefilters candidates with [[srpSignature]] buckets
    * (or IVF cells) and only scores within-bucket pairs.
    */
  def cosinePairs(
      vecs: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import graft.functions.VectorOps.dotProduct
    // Norms folded into the vectors once per ROW (normalize up front), so
    // each pair costs exactly one native dot product (see DotProduct docs
    // for why not zip_with/aggregate).
    def side(s: String) = {
      val raw = vecs.select(col(idCol).as(s"doc_$s"), asDouble(col(vecCol)).as(s"v_$s"))
      val nrm = sqrt(dotProduct(col(s"v_$s"), col(s"v_$s")))
      raw.select(col(s"doc_$s"), transform(col(s"v_$s"), x => x / nrm).as(s"v_$s"))
    }
    // repartition the stream side: the corpus often arrives as one small
    // file split, and a nested-loop join over one partition would run the
    // whole O(n²) scoring in a single task
    side("a").repartition(col("doc_a")).join(side("b"), col("doc_a") < col("doc_b"))
      .withColumn("sim", round(dotProduct(col("v_a"), col("v_b")), 4))
      .filter(col("sim") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("sim"))
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

  /** IVF-style top-k (the other scale path the brief names): a seeded
    * KMeans coarse quantizer assigns every corpus vector to a cell; each
    * query probes only its `nProbe` nearest cells and scores those
    * vectors. At 100 TB the cell assignment is a write-time partition
    * column, so a probe reads nProbe/nCells of the corpus — classic IVF.
    * Recall < 1 by construction (raise nProbe to trade).
    */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      nCells: Int, nProbe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      seed: Long = 42L): DataFrame = {
    import graft.functions.VectorOps.dotProduct
    val train = corpus.select(array_to_vector(col(vecCol)).as("features"))
    val km = new KMeans().setK(nCells).setSeed(seed).setFeaturesCol("features").fit(train)

    // centroids as a small broadcast frame (nCells × dim)
    val session = corpus.sparkSession
    import session.implicits._
    val centroids = km.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }.toSeq.toDF("cell", "centroid")

    def assign(df: DataFrame, id: String, v: String, probes: Int) = {
      val scored = df.select(col(idCol).as(id), asDouble(col(vecCol)).as(v))
        .crossJoin(broadcast(centroids))
        // nearest by squared L2: |x|² const per row → rank by |c|² - 2x·c
        .withColumn("d2",
          dotProduct(col("centroid"), col("centroid")) -
            lit(2.0) * dotProduct(col(v), col("centroid")))
      val w = Window.partitionBy(col(id)).orderBy(col("d2"), col("cell"))
      scored.withColumn("cr", row_number().over(w)).filter(col("cr") <= probes)
        .select(col(id), col(v), col("cell"))
    }

    val cells = assign(corpus, "neighbor_id", "nvec", probes = 1)
    val probes = assign(queries, "query_id", "qvec", probes = nProbe)
    val scored = cells.join(probes, Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", round(cosine(col("qvec"), col("nvec")), 4))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
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
