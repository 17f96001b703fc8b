package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.functions._

/** Margin probe for `events_retention_sketch`'s accuracy gate (the
  * probe-calibrate-before-pinning convention): per week, the exact
  * retained count, the inclusion–exclusion estimate, the union estimate,
  * and the gate's two bound terms — so the pinned-TRUE bound's headroom
  * is a printed number, not a hope. Usage: RetentionProbe [sfDir...]
  */
object RetentionProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("local[32]", shufflePartitions = 32)
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    dirs.foreach { dir =>
      probeOne(spark, dir, churn = false)
      probeOne(spark, dir, churn = true)
    }
    spark.stop()
  }

  private def probeOne(spark: org.apache.spark.sql.SparkSession,
      dir: String, churn: Boolean): Unit = {
    {
      val name =
        if (churn) "events_retention_sketch_churn" else "events_retention_sketch"
      val rows = SparkEntry.queries(name)(spark, dir)
      // re-derive the estimate terms beside the published gate output
      val ev0 = graft.sources.Tables.load(spark, dir, "events")
      val ev = if (churn) SparkEntry.churnEventsForProbe(ev0) else ev0
      val pairs = ev.select(col("user_id"),
        date_trunc("week", col("ts")).as("w")).distinct()
      val exact = pairs.select(col("user_id").as("uid_b"), col("w").as("w_b"))
      val ex = pairs.join(exact,
          col("uid_b") === col("user_id") &&
            col("w_b") === col("w") + expr("interval 7 days"))
        .groupBy(col("w")).agg(count(lit(1)).as("retained"))
      val est = graft.streaming.EventIngest.retainedEstimateFromSketches(
        spark,
        if (churn) SparkEntry.churnSketchPathForProbe(spark, dir)
        else sketchDirForProbe(spark, dir))
      val joined = est.join(ex, Seq("w"), "left")
        .select(col("w"), coalesce(col("retained"), lit(0L)).as("retained"),
          col("retained_est").cast("double").as("retained_est"),
          col("union_est").cast("double").as("union_est"))
        .select(col("w"), col("retained"), col("retained_est"), col("union_est"),
          abs(col("retained_est") - col("retained")).as("err"),
          (col("retained") * 0.05).as("rel_bound"),
          (col("union_est") * 0.05).as("floor_bound"))
        .orderBy("w")
      val tag = if (churn) "CHURN" else "natural"
      println(s"== $dir [$tag] (gate rows: ${rows.count()}) ==")
      joined.collect().foreach { r =>
        val binding =
          if (r.getDouble(6) > r.getDouble(5)) "floor" else "rel"
        println(f"  w=${r.getTimestamp(0)} retained=${r.getLong(1)}%5d " +
          f"est=${r.getDouble(2)}%9.2f union=${r.getDouble(3)}%9.2f " +
          f"err=${r.getDouble(4)}%7.2f relBound=${r.getDouble(5)}%7.2f " +
          f"floorBound=${r.getDouble(6)}%7.2f binding=$binding%-5s " +
          f"margin=${math.max(r.getDouble(5), r.getDouble(6)) / math.max(r.getDouble(4), 1e-9)}%6.1fx")
      }
      spark.catalog.clearCache()
    }
  }

  private def sketchDirForProbe(spark: org.apache.spark.sql.SparkSession,
      dir: String): String =
    SparkEntry.sketchPathForProbe(spark, dir)
}
