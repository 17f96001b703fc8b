package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streamed keyed upsert as a CHANGELOG table — the merge-on-read shape
  * of [[graft.sinks.Upsert]] under the [[BatchMarker]] exactly-once
  * protocol: each micro-batch of (key, attrs) rows appends verbatim under
  * `log/batch_id=<b>/` (the batch id IS the version — monotone by the
  * streaming engine's contract), and the serving read resolves each key
  * to its highest-batch row with one per-key window. This is the
  * Hudi/Iceberg-style ingest posture: writes are pure appends at any
  * rate; read amplification grows with log depth and is paid back by
  * compacting the resolved view over the log
  * ([[graft.sinks.Upsert.merged]] of latest → fresh log).
  *
  * Within one batch the caller owes one row per key (the same contract
  * as [[graft.sinks.Upsert]] — enforce upstream with an
  * [[graft.operators.Expectations]] uniqueness check); across batches
  * later batch ids win, which is exactly upsert semantics.
  */
object UpsertIngest {

  def start(updates: DataFrame, tablePath: String, checkpoint: String): StreamingQuery =
    updates.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, tablePath)
      }
      .start()

  /** One micro-batch, callable from tests and backfills directly. */
  def processBatch(batch: DataFrame, batchId: Long, tablePath: String): Unit = {
    val spark = batch.sparkSession
    val log = s"$tablePath/log"
    BatchMarker.assertMarkeredSink(spark, tablePath, s"$log/batch_id=*")
    BatchMarker.ensureProtocol(spark, tablePath)
    if (BatchMarker.landed(spark, tablePath, "log", batchId)) return
    BatchMarker.clearPartial(spark, s"$log/batch_id=$batchId")
    if (batch.isEmpty) {
      BatchMarker.commit(spark, tablePath, "log", batchId)
      return
    }
    batch.withColumn("batch_id", lit(batchId))
      .write.mode("append").partitionBy("batch_id").parquet(log)
    BatchMarker.commit(spark, tablePath, "log", batchId)
  }

  /** Merge-on-read resolve: latest batch per key. One shuffle on the key;
    * the window ranks the few versions of one key, never the table.
    * Precondition: at least one data-bearing batch has landed — an
    * all-empty-batch log has no files and therefore no inferable schema,
    * so the read throws (Spark's own contract; a changelog table's schema
    * is unknowable before its first row).
    */
  def readLatest(spark: SparkSession, tablePath: String, keyCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("batch_id").desc)
    spark.read.parquet(s"$tablePath/log")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "batch_id")
  }
}
