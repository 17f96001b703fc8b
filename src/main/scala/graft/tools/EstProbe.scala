package graft.tools

import graft.GraftSession
import graft.sources.Tables
import org.apache.spark.sql.functions._

object EstProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("local[32]", shufflePartitions = 32)
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val docs = Tables.load(spark, sf, "documents")
      val est = graft.operators.Dedup.minhashEstimateDebug(docs, "text", "doc_id", n = 3)
      val r = est.filter(col("jaccard") >= 0.7)
        .agg(min(col("est")).as("min_est"), count(lit(1)).as("n_qual")).head()
      val kept30 = est.filter(col("est") >= 0.30).count()
      val kept45 = est.filter(col("est") >= 0.45).count()
      val total = est.count()
      println(s"[est] $sf qualifying=${r.get(1)} min_est_among_qualifying=${r.get(0)} " +
        s"candidates=$total kept@0.45=$kept45 kept@0.30=$kept30")
    }
    spark.stop()
  }
}
