package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketized interval-containment join — the scale-safe range join.
  *
  * Spark's own plan for `points JOIN intervals ON p BETWEEN s AND e` is a
  * nested-loop (keyless: BroadcastNestedLoopJoin; with a low-cardinality
  * equi key: a sort-merge join whose per-key groups still pair
  * quadratically against the range residual). The classic fix is binning:
  * slice the domain into fixed-width bins, explode each interval to every
  * bin it overlaps, tag each point with the ONE bin containing it, and
  * equi-join on (keys…, bin) with the exact containment as a residual
  * filter. The pair space shrinks from |points|×|intervals| (per key) to
  * only the co-binned candidates, the join is a plain shuffle equi-join
  * (AQE/skew handling compose), and each matching pair is produced
  * EXACTLY once — the point's bin is unique, so no post-dedup is needed.
  *
  * `binWidth` trades interval-replication (intervals spanning many bins
  * explode wider) against candidate precision (coarse bins admit more
  * false candidates for the residual to discard); set it near the typical
  * interval length. Domains are non-negative longs — timestamp callers
  * pass `unix_micros` values.
  */
object RangeJoin {

  /** All (point, interval) rows with `keys` equal and
    * `startCol <= pointCol <= endCol` (both bounds inclusive). Column
    * names must be disjoint across the two inputs apart from `keys`.
    */
  def binnedRangeJoin(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      binWidth: Long, keys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val iv = intervals.withColumn("__bin",
      explode(sequence(expr(s"$startCol DIV ${binWidth}L"),
        expr(s"$endCol DIV ${binWidth}L"))))
    val pt = points.withColumn("__bin", expr(s"$pointCol DIV ${binWidth}L"))
    pt.join(iv, keys :+ "__bin")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bin")
  }
}
