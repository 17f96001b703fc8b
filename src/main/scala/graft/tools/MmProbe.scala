package graft.tools

import graft.operators.Multimodal
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Diagnostics main: stage-by-stage timing of the multimodal video
  * pipeline (synthesize → sample) to localize cost between codec work,
  * partitioning and engine overhead. usage: MmProbe <sfDir>
  */
object MmProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.get("local[32]", shufflePartitions = 32)
    val ids = Tables.load(spark, sfDir, "documents").select("doc_id")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[$label] ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (round <- 1 to 3) {
      println(s"--- round $round ---")
      val flat = ids.repartition(32)
      time("repartition.count")(flat.count())
      val media = Multimodal.synthesizeGifs(flat)
      println("media partitions: " + media.rdd.getNumPartitions)
      time("synthesize.count")(media.count())
      time("synth+sample.count")(
        Multimodal.sampleVideoFrames(Multimodal.synthesizeGifs(flat), 2).count())
      time("full query no-sort")(
        Multimodal.sampleVideoFrames(Multimodal.synthesizeGifs(flat), 2)
          .toDF().queryExecution.toRdd.count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
