package graft.operators

import graft.functions.TextStats
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental-rebuild state tables: compute a mergeable per-key STATE from
  * each ingestion batch, persist it, and fold new batches in — never
  * recompute the corpus. At 100 TB this is the difference between a nightly
  * delta job (read the new batch, merge kilobytes of state) and a nightly
  * full scan. Two state algebras are covered, matching the two kinds of
  * question a corpus dashboard asks:
  *
  *  - ADDITIVE (sums/counts): partial sums per key merge by summing —
  *    associative + commutative, so ANY merge tree (per-batch, per-day,
  *    per-region) reproduces the full-recompute answer exactly. Proven by
  *    `text_token_totals_incremental` sharing `text_token_totals`' oracle.
  *  - SKETCHED (distinct counts): exact distincts do NOT merge (the same
  *    user in two batches must not count twice), which is precisely what
  *    the Apache DataSketches HLL state solves — per-batch sketches union
  *    losslessly ([[distinctSketchState]] / `hll_union_agg`), and the
  *    estimate's error bound is unchanged by the merge tree. Gated by
  *    `approx_distinct_incremental` against the full-recompute exact count.
  *
  * The same pattern extends to any TypedImperativeAggregate in this repo
  * whose buffer merges ([[graft.functions.MisraGries]],
  * [[graft.functions.SmallestK]]): persist the serialized state, merge on
  * the next run.
  */
object Incremental {

  /** Per-source token/doc accounting state for one batch — the parquet-able
    * state table of the corpus-accounting dashboard.
    */
  def tokenTotalsState(batch: DataFrame, textCol: String, sourceCol: String): DataFrame =
    batch.groupBy(col(sourceCol))
      .agg(sum(TextStats.tokenCount(col(textCol)).cast("bigint")).as("total_tokens"),
        count(lit(1)).as("n_docs"))

  /** Fold any number of [[tokenTotalsState]] tables into the combined
    * totals. Addition is associative and commutative: the result equals the
    * single-pass answer for any batch split and any merge order.
    */
  def mergeTokenTotals(states: Seq[DataFrame], sourceCol: String): DataFrame = {
    require(states.nonEmpty, "need at least one state table")
    states.reduce(_.unionByName(_))
      .groupBy(col(sourceCol))
      .agg(sum(col("total_tokens")).as("total_tokens"),
        sum(col("n_docs")).as("n_docs"))
  }

  /** Per-key distinct-item state for one batch: an Apache DataSketches HLL
    * sketch per key (`lgK` buckets → ~1.04/√2^lgK relative error). The
    * sketch column is a binary a state table persists as-is.
    */
  def distinctSketchState(batch: DataFrame, keyCol: String, itemCol: String,
      lgK: Int = 14): DataFrame =
    batch.groupBy(col(keyCol))
      .agg(hll_sketch_agg(col(itemCol), lit(lgK)).as("sketch"))

  /** Union [[distinctSketchState]] tables and estimate the combined
    * distinct count per key. The union is lossless over the sketch state:
    * an item present in several batches lands in the same HLL buckets, so
    * the merged estimate carries the same error bound as a single-pass
    * sketch of the full data.
    */
  def mergeDistinctSketches(states: Seq[DataFrame], keyCol: String): DataFrame = {
    require(states.nonEmpty, "need at least one state table")
    states.reduce(_.unionByName(_))
      .groupBy(col(keyCol))
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"), lit(false)))
        .as("approx_distinct"))
  }
}
