package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.functions._

/** Probe for the crawl-refresh warm-start margin: max-abs distance of the
  * warm walk (init = ranks of the first-3-segment graph) from the cold
  * 10-round walk on the full accumulated graph, per warm-round budget.
  * usage: GraphProbe <sfDir> [maxRounds]
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val maxRounds = if (args.length > 1) args(1).toInt else 10
    val spark = GraftSession.get("local[32]", shufflePartitions = 32)
    val idx = s"${SparkEntry.warcIngestPathForProbe(spark, sfDir)}/links"
    val node = (u: org.apache.spark.sql.Column) =>
      regexp_extract(u, "/d/(\\d+)", 1).cast("long")
    val oldEdges = graft.streaming.LinkIngest.edges(spark, idx,
      upToBatch = Some(2L), nodeOf = node)
    val full = graft.streaming.LinkIngest.edges(spark, idx, nodeOf = node)
    println(s"[probe] old edges=${oldEdges.count()} full=${full.count()}")
    val oldRanks = graft.operators.Graph.pageRank(oldEdges, "src", "dst", 10)
      .localCheckpoint()
    val cold = graft.operators.Graph.pageRank(full, "src", "dst", 10)
      .withColumnRenamed("rank", "crank").localCheckpoint()
    val cold15 = graft.operators.Graph.pageRank(full, "src", "dst", 15)
      .withColumnRenamed("rank", "c15").localCheckpoint()
    val resid = cold.join(cold15, Seq("node"))
      .agg(max(abs(col("crank") - col("c15")))).first().getDouble(0)
    println(f"[probe] cold10 residual vs cold15: $resid%.6f")
    (1 to maxRounds).foreach { k =>
      val warm = graft.operators.Graph.pageRank(full, "src", "dst", k,
        init = Some(oldRanks))
      val wj = warm.join(cold, Seq("node")).join(cold15, Seq("node"))
        .agg(max(abs(col("rank") - col("crank"))).as("m10"),
          max(abs(col("rank") - col("c15"))).as("m15")).first()
      println(f"[probe] warmRounds=$k vs cold10=${wj.getDouble(0)}%.6f " +
        f"vs cold15=${wj.getDouble(1)}%.6f")
    }
    spark.stop()
  }
}
