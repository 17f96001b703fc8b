package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, Similarity}
import graft.sources.Tables

/** Diagnostics main: recall@5 of the image-feature IVF path against the
  * brute-force baseline over the decoded histogram vectors, across the
  * probe grid — where ann_image_recall's threshold comes from.
  */
object ImgAnnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = graft.GraftSession.get("local[16]", shufflePartitions = 16)
    val docs = Tables.load(spark, sfDir, "documents").select("doc_id")
    val media = Multimodal.synthesizePhashImages(
      docs.repartition(16, col("doc_id")))
    val vecs = Multimodal.imageFeatures(media, bins = 16).toDF()
      .filter(col("decoded"))
      .select(col("media_id").as("vec_id"),
        col("histogram").cast("array<double>").as("embedding"))
      .persist()
    vecs.count()
    val q = vecs.filter(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(vecs, q, k = 5).persist()
    brute.count()
    for ((cells, probe) <- Seq((8, 2), (8, 4), (8, 6), (16, 4))) {
      val ivf = Similarity.ivfTopK(vecs, q, k = 5, nCells = cells, nProbe = probe)
      val r = Similarity.recallAtK(ivf, brute).agg(
        min(col("recall")).as("min"), avg(col("recall")).as("avg")).collect()(0)
      println(f"imgivf cells=$cells%-3d probe=$probe%-2d minRecall=${r.getDouble(0)}%.2f avgRecall=${r.getDouble(1)}%.2f")
    }
    spark.stop()
  }
}
