package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Sequential-ID assignment (W1 — replaces itertools.count at
  * /root/reference/synth/etl.py:215,269,348,461,488).
  *
  * Two implementations with an explicit scale tradeoff:
  *
  *  - [[globalRowNumber]]: `row_number()` over a global ORDER BY — exactly
  *    reproducible ids, but the window serializes the table through ONE
  *    task. Fine for dimension tables (calls, disciplines); wrong for
  *    billion-row facts.
  *
  *  - [[distributedSequentialIds]]: sort once, then two-phase id assignment
  *    — per-partition row_number plus a broadcast prefix-sum of partition
  *    counts. Identical ids to the global window (dense, 1-based, ordered),
  *    but every stage is parallel; this is the 100 TB path.
  */
object Ids {

  def globalRowNumber(df: DataFrame, orderCols: Seq[String], idCol: String): DataFrame =
    df.withColumn(idCol,
      row_number().over(Window.orderBy(orderCols.map(col): _*)).cast("bigint"))

  def distributedSequentialIds(df: DataFrame, orderCols: Seq[String], idCol: String): DataFrame = {
    // materialize the INPUT before the range exchange: repartitionByRange
    // needs range bounds, and the RangePartitioner's sampling job executes
    // the input plan once BEFORE the shuffle executes it again — for the
    // flagship 48-column join tree that doubled the whole query (r17
    // measurement: etl_visitor_project_distributed 8.6 s median, the join
    // tree + clean-string projection evaluated twice). A persist() bounds
    // the extra memory to one transient copy: the eager sorted checkpoint
    // below is the last consumer, so the cache is dropped as soon as it
    // lands. At cluster scale this is "write the intermediate before
    // sampling it" (guide §1.4/§3.3 — materialize before a plan-repeating
    // exchange).
    val input = df.persist()
    // range-partition by the order key so partition order == global order.
    // localCheckpoint PINS the partitioning: both consumers below (the
    // offsets aggregation and the final join) read the SAME materialized
    // partitions — re-evaluating the plan twice can produce different
    // range boundaries (AQE coalescing, boundary re-sampling), and an
    // inner join on __pid across two different partitionings silently
    // DROPS every row whose pid only exists on one side (caught by the
    // etl_visitor_project_distributed shared oracle at sf0.1).
    // try/finally: without it an exception between persist and unpersist
    // leaked the cached copy for library callers (bench sweeps covered it
    // only in the harness).
    val sorted =
      try {
        input.count() // eager: the sample job and the shuffle read one cache
        input.repartitionByRange(orderCols.map(col): _*)
          .sortWithinPartitions(orderCols.map(col): _*)
          .withColumn("__pid", spark_partition_id())
          .localCheckpoint()
      } finally input.unpersist() // checkpoint landed (or failed); either way drop the cache
    // per-partition counts → cumulative offsets (tiny: one row per partition)
    val offsets = sorted.groupBy(col("__pid")).agg(count(lit(1)).as("__n"))
      .withColumn("__offset",
        coalesce(sum(col("__n")).over(
          Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__offset"))
    val wInPart = Window.partitionBy(col("__pid")).orderBy(orderCols.map(col): _*)
    sorted
      .withColumn("__rn", row_number().over(wInPart))
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn(idCol, (col("__offset") + col("__rn")).cast("bigint"))
      .drop("__pid", "__rn", "__offset")
  }
}
