package graft.tools

import graft.operators.Dedup
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** One-off diagnostics main: prints the corpus statistics that drive the
  * MinHash banding / shingle-cap parameters (shingle document-frequency
  * distribution, exact-Jaccard pair distribution). Not part of the product
  * surface; kept for reproducibility of the tuning decisions in PLANS.md.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = graft.GraftSession.get("local[8]", shufflePartitions = 8)
    val docs = Tables.load(spark, sfDir, "documents")
    println(s"== docs: ${docs.count()}")

    val sh = Dedup.shingled(docs, "text", "doc_id", 3).persist()
    val toks = sh.select(col("doc_id"), explode(col("shingles")).as("shingle"))
    val df = toks.groupBy("shingle").agg(count(lit(1)).as("df"))
    println("== shingle doc-frequency histogram (df -> n_shingles):")
    df.groupBy("df").count().orderBy(col("df").desc).show(30, false)

    println("== jaccard pair distribution (threshold 0.05):")
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.05).persist()
    pairs.selectExpr("floor(jaccard*10)/10 as bucket").groupBy("bucket")
      .count().orderBy("bucket").show(20, false)
    println("== pairs >= 0.18: " + pairs.filter(col("jaccard") >= 0.18).count())
    println("== top pairs:")
    pairs.orderBy(col("jaccard").desc).show(30, false)
    spark.stop()
  }
}
