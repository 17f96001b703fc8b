package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Merge-on-read deletes — the erasure pattern of every lakehouse table
  * format: deleting rows from a 100 TB corpus must not rewrite the corpus.
  * Deletes append their keys to a TOMBSTONE table (kilobytes); readers
  * subtract tombstones with a left-anti join at scan time; a periodic
  * [[apply]] pass (piggybacking on [[Compaction]]-style maintenance
  * windows) rewrites the data files physically and resets the tombstones.
  *
  * Scale shape: the tombstone side of the anti-join is small by
  * construction (deletion requests, not data), so AQE broadcasts it and
  * the read path stays a single scan + broadcast anti-join — no shuffle,
  * no rewrite until maintenance chooses to. The apply pass costs one read
  * + one write of the affected table, amortized across all accumulated
  * deletes.
  */
object Tombstones {

  /** The path's own FileSystem — tombstones live wherever the data lives
    * (hdfs://, s3a://, file:). A java.io.File existence test is
    * local-only: on a cluster filesystem it is always false, which would
    * silently IGNORE tombstones — erasure-requested rows resurfacing is
    * the worst possible failure mode for this sink.
    */
  private def fs(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  private def exists(spark: SparkSession, path: String): Boolean = {
    val (f, p) = fs(spark, path)
    f.exists(p)
  }

  /** Append deletion keys (a 1-column frame of `idCol`) to the tombstone
    * table at `tombstonePath`. Append-only: concurrent readers see either
    * the old or the new tombstone set, both consistent.
    */
  def add(ids: DataFrame, idCol: String, tombstonePath: String): Unit =
    ids.select(col(idCol)).distinct()
      .write.mode("append").parquet(tombstonePath)

  /** Merge-on-read scan: the data minus accumulated tombstones. A missing
    * tombstone table means nothing was ever deleted.
    */
  def read(spark: SparkSession, dataPath: String, tombstonePath: String,
      idCol: String): DataFrame = {
    val data = spark.read.parquet(dataPath)
    if (!exists(spark, tombstonePath)) data
    else data.join(broadcast(spark.read.parquet(tombstonePath)),
      Seq(idCol), "left_anti")
  }

  /** Merge-on-write maintenance: physically rewrite `dataPath` minus the
    * tombstones into `outPath` and reset the tombstone table. Returns the
    * number of tombstoned keys applied.
    */
  def apply(spark: SparkSession, dataPath: String, tombstonePath: String,
      idCol: String, outPath: String): Long = {
    val n =
      if (!exists(spark, tombstonePath)) 0L
      else spark.read.parquet(tombstonePath).distinct().count()
    read(spark, dataPath, tombstonePath, idCol)
      .write.mode("overwrite").parquet(outPath)
    // reset AFTER the rewrite landed: a crash before this point leaves the
    // tombstones in place (deletes stay logically applied — safe to retry)
    if (n > 0) {
      val (f, p) = fs(spark, tombstonePath)
      f.delete(p, true)
    }
    n
  }
}
