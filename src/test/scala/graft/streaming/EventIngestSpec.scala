package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class EventIngestSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-03-01 10:${min}%02d:00")

  private val allEvents = Seq(
    (1L, ts(5), "click", 1.25),
    (2L, ts(15), "click", 2.50),
    (3L, ts(25), "view", 0.75),
    (4L, ts(65), "click", 4.00), // next hour
    (5L, ts(70), "view", 1.00))

  private def batchAgg = allEvents.toDF("event_id", "ts", "event_type", "value")
    .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
    .agg(count(lit(1)).as("n"),
      sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
    .select(col("w.start").as("window_start"), col("event_type"),
      col("n"), col("total_value"))
    .collect().map(_.toSeq).toSet

  test("streamed micro-batches accumulate to exactly the batch hourly rollup") {
    val dir = Files.createTempDirectory("evingest").toFile
    dir.deleteOnExit()
    val agg = dir.getAbsolutePath + "/idx"
    val cp = dir.getAbsolutePath + "/cp"

    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String, Double)]
    val events = input.toDF().toDF("event_id", "ts", "event_type", "value")
    val q = EventIngest.start(events, agg, cp)
    try {
      input.addData(allEvents.take(3): _*)
      q.processAllAvailable()
      input.addData(allEvents.drop(3): _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = EventIngest.hourlyFromAccumulated(spark, agg)
      .select("window_start", "event_type", "n", "total_value")
      .collect().map(_.toSeq).toSet
    assert(streamed === batchAgg)
  }

  test("replay of a landed batch is a no-op; a crashed append rewrites") {
    val dir = Files.createTempDirectory("evreplay").toFile
    dir.deleteOnExit()
    val agg = dir.getAbsolutePath + "/idx"
    val b0 = allEvents.take(3).toDF("event_id", "ts", "event_type", "value")
    val b1 = allEvents.drop(3).toDF("event_id", "ts", "event_type", "value")

    EventIngest.processBatch(b0, 0L, agg)
    EventIngest.processBatch(b0, 0L, agg) // full replay: marker short-circuits
    // simulated crash window: batch 1's dir lands WITHOUT its marker —
    // replay must delete the partial and rewrite, not double-append
    b1.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("partial_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("partial_value"))
      .withColumn("batch_id", lit(1L))
      .write.mode("append").partitionBy("batch_id").parquet(s"$agg/agg")
    EventIngest.processBatch(b1, 1L, agg)

    val merged = EventIngest.hourlyFromAccumulated(spark, agg)
      .select("window_start", "event_type", "n", "total_value")
      .collect().map(_.toSeq).toSet
    assert(merged === batchAgg)

    // an empty micro-batch advances the marker and writes nothing
    EventIngest.processBatch(b0.limit(0), 2L, agg)
    assert(BatchMarker.landed(spark, agg, "agg", 2L))
    val after = EventIngest.hourlyFromAccumulated(spark, agg)
      .select("window_start", "event_type", "n", "total_value")
      .collect().map(_.toSeq).toSet
    assert(after === batchAgg)
  }

  test("activity accumulation: cross-batch duplicate (user, day) pairs " +
      "collapse; replay and empty batches are no-ops") {
    val dir = Files.createTempDirectory("evactivity").toFile
    dir.deleteOnExit()
    val agg = dir.getAbsolutePath + "/idx"
    // user 7 is active at 10:05 AND 10:40 across DIFFERENT batches — the
    // set union must keep one (7, day) row; user 8 appears twice within
    // one batch (the per-batch distinct handles that side)
    val b0 = Seq((1L, ts(5), "click", 1.0), (7L, ts(5), "view", 1.0),
      (8L, ts(10), "click", 1.0), (8L, ts(20), "view", 1.0))
      .toDF("user_id", "ts", "event_type", "value")
      .select(col("user_id"), col("ts"))
    val b1 = Seq((7L, ts(40), "click", 1.0), (9L, ts(45), "view", 1.0))
      .toDF("user_id", "ts", "event_type", "value")
      .select(col("user_id"), col("ts"))
    EventIngest.processActivityBatch(b0, 0L, agg)
    EventIngest.processActivityBatch(b1, 1L, agg)
    EventIngest.processActivityBatch(b0, 0L, agg) // replay: marker no-op
    EventIngest.processActivityBatch(b0.limit(0), 2L, agg) // empty advance
    val pairs = EventIngest.activityFromAccumulated(spark, agg)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    val day = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
    assert(pairs === Set((1L, day), (7L, day), (8L, day), (9L, day)))
    assert(BatchMarker.landed(spark, agg, "activity", 2L))
  }

  test("a crash MID-append (unreadable debris in the batch dir) replays clean") {
    // harsher than the complete-but-unmarked window: the batch dir holds
    // a CORRUPT file. The replay's clearPartial must remove it before the
    // rewrite, and the merged read must neither crash nor double-count.
    val dir = Files.createTempDirectory("evdebris").toFile
    dir.deleteOnExit()
    val agg = dir.getAbsolutePath + "/idx"
    val b0 = allEvents.take(3).toDF("event_id", "ts", "event_type", "value")
    val b1 = allEvents.drop(3).toDF("event_id", "ts", "event_type", "value")
    EventIngest.processBatch(b0, 0L, agg)
    val debris = new java.io.File(s"$agg/agg/batch_id=1")
    debris.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(debris, "part-corrupt.snappy.parquet").toPath,
      "not parquet at all".getBytes("UTF-8"))
    EventIngest.processBatch(b1, 1L, agg)
    val merged = EventIngest.hourlyFromAccumulated(spark, agg)
      .select("window_start", "event_type", "n", "total_value")
      .collect().map(_.toSeq).toSet
    assert(merged === batchAgg)
  }

  test("sketch accumulation: per-day HLL unions estimate the exact DAU") {
    val dir = Files.createTempDirectory("evsketch").toFile
    dir.deleteOnExit()
    val agg = dir.getAbsolutePath + "/idx"
    // 40 distinct users across two batches with overlap (users 10-19 in
    // both) — the union must not double-count them
    val b0 = (0L until 20L).map(u => (u, ts(5), "click", 1.0))
      .toDF("user_id", "ts", "event_type", "value")
    val b1 = (10L until 40L).map(u => (u, ts(30), "view", 1.0))
      .toDF("user_id", "ts", "event_type", "value")
    EventIngest.processSketchBatch(b0.select("user_id", "ts"), 0L, agg)
    EventIngest.processSketchBatch(b1.select("user_id", "ts"), 1L, agg)
    EventIngest.processSketchBatch(b0.select("user_id", "ts"), 0L, agg) // replay
    val est = EventIngest.dauEstimateFromSketches(spark, agg)
      .collect().head.getLong(1)
    // at 40 uniques the HLL sketch is exact in practice; allow 5%
    assert(math.abs(est - 40L) <= 2, s"estimate $est too far from 40")
    // one sketch row per (batch, day touched) — constant in users
    assert(spark.read.parquet(s"$agg/sketches").count() === 2L)
  }

  test("sketch WAU: the 7-day union of per-day sketches tracks exact WAU") {
    val dir = Files.createTempDirectory("evwausketch").toFile
    dir.deleteOnExit()
    val agg = dir.getAbsolutePath + "/idx"
    def dayTs(d: Int) = Timestamp.valueOf(f"2024-03-0$d%d 00:00:00")
    // day 1: users 0-19; day 3: users 10-39 — both inside each other's
    // trailing-7-day window, overlap 10-19 must not double-count
    val b0 = (0L until 20L).map(u => (u, dayTs(1))).toDF("user_id", "ts")
    val b1 = (10L until 40L).map(u => (u, dayTs(3))).toDF("user_id", "ts")
    EventIngest.processSketchBatch(b0, 0L, agg)
    EventIngest.processSketchBatch(b1, 1L, agg)
    val wau = EventIngest.wauEstimateFromSketches(spark, agg)
      .collect().map(r => r.getTimestamp(0).toString.take(10) -> r.getLong(1))
      .toMap
    // observed report days only: day 1 (sees day 1 alone) and day 3
    // (sees days 1+3 — the union across sketch days)
    assert(wau.keySet === Set("2024-03-01", "2024-03-03"))
    assert(math.abs(wau("2024-03-01") - 20L) <= 1, s"day1 ${wau("2024-03-01")}")
    assert(math.abs(wau("2024-03-03") - 40L) <= 2, s"day3 ${wau("2024-03-03")}")
  }

  test("sketch retention: inclusion-exclusion on weekly unions tracks the " +
      "exact week-over-week intersection") {
    val dir = Files.createTempDirectory("evretsketch").toFile
    dir.deleteOnExit()
    val agg = dir.getAbsolutePath + "/idx"
    // week of Mar 4 (Mon): users 0-59; week of Mar 11: users 40-99 —
    // exact retained = |{40..59}| = 20; weeks split across two batches
    // and two days each so the day→week union is load-bearing
    def ts(d: Int) = Timestamp.valueOf(f"2024-03-$d%02d 12:00:00")
    val wk1 = (0L until 60L).map(u => (u, ts(if (u % 2 == 0) 4 else 6)))
    val wk2 = (40L until 100L).map(u => (u, ts(if (u % 2 == 0) 11 else 13)))
    EventIngest.processSketchBatch(
      (wk1 ++ wk2).filter(_._1 % 3 != 0).toDF("user_id", "ts"), 0L, agg)
    EventIngest.processSketchBatch(
      (wk1 ++ wk2).filter(_._1 % 3 == 0).toDF("user_id", "ts"), 1L, agg)
    val got = EventIngest.retainedEstimateFromSketches(spark, agg).collect()
    assert(got.length === 1) // only the (Mar 4, Mar 11) consecutive pair
    assert(got.head.getTimestamp(0).toString.startsWith("2024-03-04"))
    val est = got.head.getLong(1)
    assert(math.abs(est - 20L) <= 2, s"retained estimate $est vs exact 20")
  }

  test("per-batch partial files compact per batch_id=; replay state travels") {
    val dir = Files.createTempDirectory("evcompact").toFile
    dir.deleteOnExit()
    val agg = dir.getAbsolutePath + "/idx"
    val compacted = dir.getAbsolutePath + "/compacted"
    allEvents.zipWithIndex.foreach { case (e, i) =>
      EventIngest.processBatch(
        Seq(e).toDF("event_id", "ts", "event_type", "value"), i.toLong, agg)
    }
    val stats = graft.sinks.Compaction.compactPartitions(
      spark, s"$agg/agg", s"$compacted/agg", targetBytes = 1L << 30)
    assert(stats.size === allEvents.size &&
      stats.keys.forall(_.startsWith("batch_id=")))
    assert(stats.values.forall(_.filesAfter === 1))
    // a compacted copy is the SAME rollup: markers travel with the data,
    // so the merge read answers identically and a replay is still a no-op
    val src = new java.io.File(s"$agg/_batches")
    val dst = new java.io.File(s"$compacted/_batches")
    dst.mkdirs()
    src.listFiles().foreach(f => java.nio.file.Files.copy(
      f.toPath, new java.io.File(dst, f.getName).toPath))
    val merged = EventIngest.hourlyFromAccumulated(spark, compacted)
      .select("window_start", "event_type", "n", "total_value")
      .collect().map(_.toSeq).toSet
    assert(merged === batchAgg)
    val n0 = spark.read.parquet(s"$compacted/agg").count()
    EventIngest.processBatch(
      Seq(allEvents.head).toDF("event_id", "ts", "event_type", "value"),
      0L, compacted)
    assert(spark.read.parquet(s"$compacted/agg").count() === n0,
      "replay re-appended into the compacted rollup")
  }

  test("session state carries across batch cuts: a session spanning the " +
      "boundary is ONE session; a gap at the boundary opens a new one") {
    val dir = Files.createTempDirectory("evsess").toFile
    dir.deleteOnExit()
    val agg = dir.getAbsolutePath + "/idx"
    // user 7: events at 10:05 and 10:20 (batch 0), 10:30 (batch 1) —
    //   every gap < 30 min => one session spanning the cut.
    // user 8: event at 10:00 (batch 0), then 11:10 (batch 1) — 70 min
    //   of silence => the boundary event opens session 2.
    val b0 = Seq((1L, ts(5), 7L), (2L, ts(20), 7L), (3L, ts(0), 8L))
    val b1 = Seq((4L, ts(30), 7L), (5L, Timestamp.valueOf("2024-03-01 11:10:00"), 8L))
    EventIngest.processSessionBatch(
      b0.toDF("event_id", "ts", "user_id"), 0L, agg, gapMinutes = 30)
    EventIngest.processSessionBatch(
      b1.toDF("event_id", "ts", "user_id"), 1L, agg, gapMinutes = 30)
    val got = EventIngest.sessionStateFromAccumulated(spark, agg)
      .select("user_id", "n_sessions", "n_events")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(7L) === ((1L, 3L)), "span session split at the batch cut")
    assert(got(8L) === ((2L, 2L)), "boundary gap did not open a session")
    // replaying a landed batch is a no-op on the accumulated state
    EventIngest.processSessionBatch(
      b0.toDF("event_id", "ts", "user_id"), 0L, agg, gapMinutes = 30)
    val again = EventIngest.sessionStateFromAccumulated(spark, agg)
      .select("user_id", "n_sessions", "n_events")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(again === got)
  }
}
