package graft.sinks

import graft.operators.Curation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Trainer-ready sharded export: deal rows into `nShards` reproducibly
  * shuffled shards ([[Curation.shuffledShards]] — md5-mod shard id,
  * hash-order position) and write ONE file per shard, rows already in
  * shard_pos order, under `path/shard=<i>/`.
  *
  * This is the write-side contract a training loader wants: a fixed shard
  * count it can assign to data-loader workers, a globally-shuffled order
  * that is a pure function of the data (re-runs produce byte-identical
  * shards — no `orderBy(rand())`), and within-shard order preserved by
  * parquet row order so the loader streams sequentially with no sort.
  *
  * Plan shape: `repartition(nShards, shard)` is the ONE shuffle;
  * `sortWithinPartitions` sorts each shard in its task (no global sort,
  * no range exchange); `partitionBy("shard")` then splits files by the
  * directory column each task already holds exclusively, so every shard
  * directory gets exactly one file. At 100 TB, nShards is picked so a
  * shard fits a loader worker (e.g. 10k shards of ~10 GB); the per-task
  * sort spills gracefully if a shard exceeds executor memory.
  *
  * One caveat is inherited from hash partitioning: `repartition(n, col)`
  * routes by `hash(shard) % n`, which for n = nShards need not be a
  * bijection shard→task — two shards can share a task and some tasks get
  * none. Files stay correct (partitionBy splits them), but a skewed
  * assignment would serialize two shards' sorts through one task, so we
  * route by the shard id ITSELF via range partitioning on the already
  * uniform integer — `repartitionByRange(nShards, shard)` gives each
  * shard its own task at equal row counts (md5 uniformity), which is the
  * layout the sort and the writer want.
  */
object ShardWriter {

  def writeShards(df: DataFrame, idCol: String, nShards: Int, path: String): Unit =
    Curation.shuffledShards(df, idCol, nShards)
      .repartitionByRange(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("shard_pos"))
      .drop("shuffle_key")
      .write.mode("overwrite")
      .partitionBy("shard")
      .parquet(path)

  /** JSONL variant of [[writeShards]] — the interchange format most
    * training loaders and data-inspection tools actually consume (one JSON
    * object per line). Same deal-and-sort physics: one shuffle to route
    * rows to their shard's task, per-task sort by shard position, one text
    * file per `shard=<i>/` directory with rows already in shuffled order.
    *
    * Serialization is `to_json(struct(...))` — Jackson inside codegen, no
    * UDF; the row becomes a single `value` string column, which is the one
    * schema Spark's text writer accepts. Column order inside each object
    * follows the input schema, so re-runs are byte-identical like the
    * parquet path. At 100 TB prefer parquet shards (columnar, compressed,
    * stats); JSONL is the interop sink, ~3-5× larger on disk.
    */
  def writeJsonlShards(df: DataFrame, idCol: String, nShards: Int, path: String): Unit =
    Curation.shuffledShards(df, idCol, nShards)
      .repartitionByRange(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("shard_pos"))
      .select(col("shard"),
        to_json(struct(df.columns.map(col).toIndexedSeq: _*)).as("value"))
      .write.mode("overwrite")
      .partitionBy("shard")
      .text(path)

  /** Read a [[writeJsonlShards]] directory back with a DECLARED schema —
    * schema-on-read, never inference: at 100 TB, `spark.read.json` without
    * a schema runs a full extra pass over the data just to guess types
    * (and guesses wider than the writer meant). The `shard` partition
    * column comes from the directory layout for free.
    */
  def readJsonlShards(spark: org.apache.spark.sql.SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Z-order-clustered parquet write: range-partition and sort the rows by
    * the Morton key of (`colA`, `colB`) so each of the `nFiles` output
    * files covers a TILE in (a, b) space — parquet min/max statistics then
    * prune range filters on EITHER column, where a single-key sort gives
    * pruning on one column and full scans on the other
    * ([[graft.functions.ZOrder]]; the scheme behind lakehouse clustering
    * keys).
    *
    * Plan shape: ONE range exchange on the key (driver samples the key
    * distribution — no global sort), per-task sort, no partitionBy
    * directory explosion: min/max stats do the pruning, so the layout
    * stays `nFiles` flat files a reader lists cheaply. At 100 TB, pick
    * `nFiles` for ~1 GB files; appends re-cluster per batch directory
    * (z-order degrades gracefully under append — each batch's files stay
    * tiled).
    */
  def writeZOrdered(df: DataFrame, colA: String, colB: String,
      nFiles: Int, path: String): Unit =
    df.withColumn("__z", graft.functions.ZOrder.interleave(col(colA), col(colB)))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite")
      .parquet(path)
}
