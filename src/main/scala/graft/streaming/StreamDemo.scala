package graft.streaming

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Runnable Structured Streaming entrypoint: treats the events parquet as a
  * file-stream source, runs the watermarked tumbling-window aggregation,
  * and drains it with Trigger.AvailableNow (process-everything-then-stop —
  * the batch-like mode used for backfills). Usage:
  *
  * {{{ scripts/run.sh graft.streaming.StreamDemo /root/testdata/sf0.001 }}}
  *
  * Prints one line per (window, event_type) and exits — the same
  * `EventStreams.hourlyCounts` code the batch query `events_hourly` runs,
  * now executing as an actual incremental streaming query with state.
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val dir   = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.get("local[4]", shufflePartitions = 4)

    // file-stream sources need an explicit schema; ts arrives as NANOS →
    // long (see Tables.load note)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))

    // file-stream sources watch a DIRECTORY (the landing zone); stage the
    // fixture file into one
    val landing = java.nio.file.Files.createTempDirectory("events_landing")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      landing.resolve("events-000.parquet"))

    val stream = spark.readStream.schema(schema)
      .parquet(landing.toString)
      .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))

    val q = EventStreams.hourlyCounts(stream)
      .writeStream
      .format("memory").queryName("hourly_stream")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val out = spark.table("hourly_stream")
      .orderBy("window_start", "event_type")
    val n = out.count()
    out.show(10, truncate = false)
    println(s"[stream-demo] windows×types: $n (streaming query ran to completion)")
    spark.stop()
  }
}
