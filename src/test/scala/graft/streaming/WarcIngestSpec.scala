package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** WarcIngest (streamed crawl curation): url first-claim across batches
  * (incl. quality-failed claimers holding their slot), text-md5 dedup
  * against kept history, within-batch tiers, replay idempotence, and the
  * append-landed/marker-missing crash window.
  */
class WarcIngestSpec extends SparkSpec {

  import spark.implicits._

  private def pages(rows: (Long, String, Long, String)*): DataFrame =
    rows.toDF("doc_id", "url", "n_tokens", "text_md5")

  private def keptSet(logPath: String): Set[(Long, String, Long)] =
    WarcIngest.kept(spark, logPath).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  private def logRows(logPath: String): Set[(Long, Boolean, Long)] =
    spark.read.parquet(logPath)
      .selectExpr("doc_id", "kept", "CAST(batch_id AS BIGINT)").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2))).toSet

  private val batch0 = pages(
    (1L, "u/a", 2L, "m1"), // claims u/a, fails quality
    (2L, "u/b", 5L, "m2"), // kept
    (3L, "u/b", 9L, "m3"), // same-batch alias of u/b -> never logged
    (4L, "u/c", 4L, "m2")) // new url, passes quality, loses md5 m2 to doc 2

  private val batch1 = pages(
    (10L, "u/a", 8L, "m4"), // u/a claimed in batch 0 -> never logged
    (11L, "u/d", 7L, "m2"), // new url, passes quality, md5 m2 kept in batch 0
    (12L, "u/e", 1L, "m5"), // new claim, fails quality
    (13L, "u/e", 9L, "m6"), // same-batch alias of u/e -> never logged
    (14L, "u/f", 6L, "m6")) // kept (m6's only logged bearer)

  private def runBoth(): String = {
    val log = Files.createTempDirectory("warc_ingest").toString + "/log"
    WarcIngest.processBatch(batch0, 0L, log)
    WarcIngest.processBatch(batch1, 1L, log)
    log
  }

  test("tiers compose across batches: quality-failed claims hold their url slot, kept md5s block later bearers") {
    val log = runBoth()
    assert(keptSet(log) === Set((2L, "u/b", 5L), (14L, "u/f", 6L)))
    // the log holds exactly the url CLAIMS (first arrival per url, ever);
    // later aliases and same-batch losers never land at all
    assert(logRows(log) === Set(
      (1L, false, 0L), (2L, true, 0L), (4L, false, 0L),
      (11L, false, 1L), (12L, false, 1L), (14L, true, 1L)))
  }

  test("replaying a landed batch is a no-op") {
    val log = runBoth()
    val before = logRows(log)
    WarcIngest.processBatch(batch1, 1L, log)
    assert(logRows(log) === before)
    assert(keptSet(log) === Set((2L, "u/b", 5L), (14L, "u/f", 6L)))
  }

  test("crash between append and marker replays as delete + row-identical rewrite") {
    val log = runBoth()
    val before = logRows(log)
    // simulate the crash window: batch 1's data landed, its marker did not
    val marker = new org.apache.hadoop.fs.Path(s"$log/_batches/log_1")
    val fs = marker.getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.delete(marker, false))
    WarcIngest.processBatch(batch1, 1L, log)
    assert(logRows(log) === before) // no double-append, same rows
    assert(fs.exists(marker))
  }

  test("log compacts via sinks/Compaction with replay state copied: kept() identical, replay short-circuits, ingest continues") {
    val log = runBoth()
    val out = Files.createTempDirectory("warc_ingest_compact").toString + "/log"
    val stats = graft.sinks.Compaction.compactPartitions(spark, log, out, 64L << 20)
    assert(stats.keySet === Set("batch_id=0", "batch_id=1"))
    // copy the replay state the BatchMarker header prescribes (covers the
    // markers AND the has_data sentinel, which lives inside _batches)
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(log).getFileSystem(conf)
    org.apache.hadoop.fs.FileUtil.copy(
      fs, new org.apache.hadoop.fs.Path(s"$log/_batches"),
      fs, new org.apache.hadoop.fs.Path(s"$out/_batches"), false, conf)
    assert(keptSet(out) === keptSet(log))
    // a replay of a landed batch short-circuits on the copied marker
    val before = logRows(out)
    WarcIngest.processBatch(batch1, 1L, out)
    assert(logRows(out) === before)
    // and ingest continues against the compacted log (history intact:
    // u/a is still claimed, m2 still blocks)
    WarcIngest.processBatch(pages(
      (20L, "u/a", 9L, "m9"), (21L, "u/z", 9L, "m2"), (22L, "u/y", 9L, "m9")), 2L, out)
    assert(keptSet(out) === keptSet(log) + ((22L, "u/y", 9L)))
  }

  test("start(): a real binaryFile stream of arriving WARC segments drives the claim log, restart is a no-op") {
    import graft.sources.Warc
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val root = Files.createTempDirectory("warc_stream").toString
    val in = s"$root/in"; val log = s"$root/log"; val cp = s"$root/cp"
    new java.io.File(in).mkdirs()
    def ids(a: Long, b: Long) = spark.range(a, b).select($"id".as("doc_id"))

    // segment 0 arrives (one gzipped WARC file)
    Warc.synthesizeFiles(spark, ids(0, 10), "doc_id", in, nFiles = 1)

    val binSchema = StructType(Seq(
      StructField("path", StringType), StructField("modificationTime", TimestampType),
      StructField("length", LongType), StructField("content", BinaryType)))
    def run(): Unit = {
      import spark.implicits._
      val recs = spark.readStream.format("binaryFile")
        .schema(binSchema).option("pathGlobFilter", "*.warc*").load(in)
        .select($"path", $"content").as[(String, Array[Byte])]
        .flatMap { case (p, c) => graft.sources.Warc.parseAll(p, c) }
      // page digest derived map-side (the spec keeps extraction minimal:
      // the tiers only need doc_id / url / n_tokens / text_md5)
      val pgs = recs.filter($"warc_type" === "response").toDF()
        .select(regexp_extract($"record_id", "doc-(\\d+)", 1).cast("long").as("doc_id"),
          graft.functions.Url.canonicalizeUrl($"uri").as("url"),
          lit(5L).as("n_tokens"),
          md5($"payload").as("text_md5"))
      val q = WarcIngest.start(pgs, log, cp)
      try q.processAllAvailable() finally q.stop()
    }
    run()
    val afterSeg0 = logRows(log)
    assert(afterSeg0.nonEmpty && afterSeg0.forall(_._3 == 0L))

    // segment 1 arrives while the stream is down; restart resumes from
    // the checkpoint and processes ONLY the new file
    val tmpSeg = Files.createTempDirectory("warc_seg1").toString
    Warc.synthesizeFiles(spark, ids(10, 20), "doc_id", tmpSeg, nFiles = 1)
    Files.move(java.nio.file.Paths.get(s"$tmpSeg/part-00000.warc.gz"),
      java.nio.file.Paths.get(s"$in/part-00001.warc.gz"))
    run()
    val afterSeg1 = logRows(log)
    assert(afterSeg1.exists(_._3 == 1L))
    assert(afterSeg1.filter(_._3 == 0L) === afterSeg0) // batch 0 untouched

    // the streamed log equals the manual-batch protocol over the same
    // two page frames (real-stream ≡ manual-processBatch equivalence)
    val manual = s"$root/log2"
    def pagesOf(a: Long, b: Long) = {
      import spark.implicits._
      graft.sources.Warc.responses(
          graft.sources.Warc.readRecords(spark,
            if (a == 0) s"$in/part-00000.warc.gz" else s"$in/part-00001.warc.gz")).toDF()
        .select(regexp_extract($"record_id", "doc-(\\d+)", 1).cast("long").as("doc_id"),
          graft.functions.Url.canonicalizeUrl($"uri").as("url"),
          lit(5L).as("n_tokens"),
          md5($"payload").as("text_md5"))
    }
    WarcIngest.processBatch(pagesOf(0, 10), 0L, manual)
    WarcIngest.processBatch(pagesOf(10, 20), 1L, manual)
    assert(keptSet(log) === keptSet(manual))

    // a third restart with nothing new is a no-op
    run()
    assert(logRows(log) === afterSeg1)
  }

  test("kept() before any data-bearing batch returns an empty typed frame") {
    val dir = java.nio.file.Files.createTempDirectory("warckept").toFile
    dir.deleteOnExit()
    val log = dir.getAbsolutePath + "/log"
    val empty = WarcIngest.kept(spark, log) // no sentinel yet: no throw
    assert(empty.columns.toSeq === Seq("doc_id", "url", "n_tokens"))
    assert(empty.isEmpty)
  }

  test("a quality-failed claim is not revived by a replay that re-reads history") {
    // regression guard: batch 1's anti-join must see batch 0's claims on
    // replay exactly as the first run did — doc 10 stays unlogged
    val log = runBoth()
    val marker = new org.apache.hadoop.fs.Path(s"$log/_batches/log_1")
    val fs = marker.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(marker, false)
    WarcIngest.processBatch(batch1, 1L, log)
    assert(!logRows(log).exists(_._1 == 10L))
  }
}
