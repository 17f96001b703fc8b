package graft.tools

import graft.operators.Similarity
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Diagnostics main: prints recall@k of the two approximate ANN paths
  * (SRP-LSH, IVF) against the brute-force cosine baseline at a given sf dir,
  * across the parameter grid the product queries use. The numbers printed
  * here are where the `ann_*_recall` query thresholds and the
  * SimilaritySpec recall gates come from.
  */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = graft.GraftSession.get("local[16]", shufflePartitions = 16)
    val emb = Tables.load(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(emb, queries, k = 5).persist()
    brute.count()

    for ((bits, tables) <- Seq((4, 1), (4, 8), (4, 16), (3, 8), (3, 16), (2, 8))) {
      val lsh = Similarity.lshTopK(emb, queries, k = 5, dim = 64, bits = bits, tables = tables)
      val r = Similarity.recallAtK(lsh, brute).agg(
        min(col("recall")).as("min"), avg(col("recall")).as("avg")).collect()(0)
      println(f"lsh bits=$bits%-2d tables=$tables%-3d minRecall=${r.getDouble(0)}%.2f avgRecall=${r.getDouble(1)}%.2f")
    }
    for ((cells, probe) <- Seq((8, 1), (8, 2), (8, 4), (16, 4))) {
      val ivf = Similarity.ivfTopK(emb, queries, k = 5, nCells = cells, nProbe = probe)
      val r = Similarity.recallAtK(ivf, brute).agg(
        min(col("recall")).as("min"), avg(col("recall")).as("avg")).collect()(0)
      println(f"ivf cells=$cells%-2d probe=$probe minRecall=${r.getDouble(0)}%.2f avgRecall=${r.getDouble(1)}%.2f")
    }
    for (refine <- Seq(4, 8, 16, 32)) {
      val pq = Similarity.pqTopK(emb, queries, k = 5, refine = refine,
        corpusId = Some(sfDir))
      val r = Similarity.recallAtK(pq, brute).agg(
        min(col("recall")).as("min"), avg(col("recall")).as("avg")).collect()(0)
      println(f"pq m=8 ksub=16 refine=$refine%-3d minRecall=${r.getDouble(0)}%.2f avgRecall=${r.getDouble(1)}%.2f")
    }
    for ((probe, ksub) <- Seq((2, 16), (4, 16), (8, 16), (4, 32), (6, 32), (8, 32))) {
      val ivfpq = Similarity.ivfPqTopK(emb, queries, k = 5, nCells = 8,
        nProbe = probe, ksub = ksub, refine = 32, corpusId = Some(sfDir))
      val r = Similarity.recallAtK(ivfpq, brute).agg(
        min(col("recall")).as("min"), avg(col("recall")).as("avg")).collect()(0)
      println(f"ivfpq cells=8 probe=$probe%-2d ksub=$ksub%-3d refine=32 minRecall=${r.getDouble(0)}%.2f avgRecall=${r.getDouble(1)}%.2f")
    }
    // the residual-coding A/B at the product budget (expected to LOSE on
    // this isotropic corpus — see fitPqCodebooksResidual's scaladoc)
    for ((probe, ksub) <- Seq((4, 16), (6, 32))) {
      val ivfpq = Similarity.ivfPqTopK(emb, queries, k = 5, nCells = 8,
        nProbe = probe, ksub = ksub, refine = 32, corpusId = Some(sfDir),
        residual = true)
      val r = Similarity.recallAtK(ivfpq, brute).agg(
        min(col("recall")).as("min"), avg(col("recall")).as("avg")).collect()(0)
      println(f"ivfpq-RES cells=8 probe=$probe%-2d ksub=$ksub%-3d refine=32 minRecall=${r.getDouble(0)}%.2f avgRecall=${r.getDouble(1)}%.2f")
    }
    spark.stop()
  }
}
