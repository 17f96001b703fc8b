package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{Dedup, Multimodal}

class PhashIngestSpec extends SparkSpec {
  import spark.implicits._

  private def media(ids: Seq[Long]) =
    Multimodal.synthesizePhashImages(ids.toDF("doc_id"))

  private def allSigs(ids: Seq[Long]) =
    Multimodal.imageDHash(media(ids)).toDF()
      .filter(col("decoded"))
      .select(col("media_id").as("doc_id"), col("hash_hi"), col("hash_lo"))

  test("two disjoint batches accumulate to exactly the all-pairs set, " +
      "each pair exactly once (in the batch of its later member)") {
    val dir = Files.createTempDirectory("phash_ingest").toFile
    dir.deleteOnExit()
    val idx = dir.getAbsolutePath
    val ids = 0L until 40L
    val (oldIds, newIds) = ids.partition(_ % 7 != 3)
    PhashIngest.processBatch(media(oldIds), 0L, idx)
    PhashIngest.processBatch(media(newIds), 1L, idx)

    val got = PhashIngest.readPairs(spark, idx)
      .select("doc_a", "doc_b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = Dedup.hammingPairsHiLo(allSigs(ids), maxHamming = 3, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(want.nonEmpty, "fixture planted no near-dup pairs")
    assert(got.sorted.toSeq === want.sorted.toSeq,
      "streamed accumulation diverged from the one-shot all-pairs set")
    assert(got.length === got.distinct.length, "a pair was double-emitted")

    // every pair carrying a batch-1 member landed in batch 1, the rest
    // in batch 0 — the "batch of the later member" invariant
    val byBatch = spark.read.parquet(s"$idx/pairs")
      .select("doc_a", "doc_b", "batch_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val newSet = newIds.toSet
    byBatch.foreach { case ((a, b), bid) =>
      val expect = if (newSet(a) || newSet(b)) 1 else 0
      assert(bid === expect, s"pair ($a,$b) landed in batch $bid")
    }
  }

  test("replaying a landed batch is a complete no-op") {
    val dir = Files.createTempDirectory("phash_replay").toFile
    dir.deleteOnExit()
    val idx = dir.getAbsolutePath
    PhashIngest.processBatch(media(0L until 8L), 0L, idx)
    val pairs = PhashIngest.readPairs(spark, idx).count()
    val sigs = PhashIngest.readSigs(spark, idx).count()
    PhashIngest.processBatch(media(0L until 8L), 0L, idx)
    assert(PhashIngest.readPairs(spark, idx).count() === pairs)
    assert(PhashIngest.readSigs(spark, idx).count() === sigs)
  }

  test("a crash between the pairs and signature appends replays without " +
      "double-emitting pairs") {
    val dir = Files.createTempDirectory("phash_crash").toFile
    dir.deleteOnExit()
    val idx = dir.getAbsolutePath
    PhashIngest.processBatch(media(0L until 8L), 0L, idx)
    PhashIngest.processBatch(media(8L until 12L), 1L, idx)
    val pairsBefore = PhashIngest.readPairs(spark, idx).count()

    // simulate the crash window: batch 1's pairs landed and markered, its
    // signature append did not (dir and marker gone)
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(s"$idx/sigs/batch_id=1"), true)
    fs.delete(new org.apache.hadoop.fs.Path(s"$idx/_batches/sigs_1"), false)

    PhashIngest.processBatch(media(8L until 12L), 1L, idx)
    assert(PhashIngest.readPairs(spark, idx).count() === pairsBefore,
      "replay double-emitted the crashed batch's pairs")
    assert(spark.read.parquet(s"$idx/sigs")
        .filter(col("batch_id") === 1).count() === 4,
      "replay did not complete the signature append")
  }

  test("mid-append debris of an uncommitted batch is cleared, not " +
      "double-counted; _temporary-only first contact completes") {
    val dir = Files.createTempDirectory("phash_debris").toFile
    dir.deleteOnExit()
    val idx = dir.getAbsolutePath
    // a hard crash mid-first-write: dirs exist but hold no readable parquet
    new java.io.File(s"$idx/pairs", "_temporary/0").mkdirs()
    new java.io.File(s"$idx/sigs", "_temporary/0").mkdirs()
    PhashIngest.processBatch(media(0L until 8L), 0L, idx)
    val sigs0 = PhashIngest.readSigs(spark, idx).count()
    assert(sigs0 === 8)

    // batch 1 crashed mid-append: partial sig rows on disk, no marker
    allSigs(Seq(100L)).withColumn("batch_id", lit(1L))
      .write.mode("append").partitionBy("batch_id").parquet(s"$idx/sigs")
    PhashIngest.processBatch(media(Seq(100L, 101L)), 1L, idx)
    assert(spark.read.parquet(s"$idx/sigs")
        .filter(col("batch_id") === 1).count() === 2,
      "partial debris was double-counted or the rewrite dropped rows")
  }

  test("the signature index compacts (Compaction.compactPartitions) with " +
      "markers, sentinel and replay semantics intact") {
    val dir = Files.createTempDirectory("phash_compact").toFile
    dir.deleteOnExit()
    val idx = dir.getAbsolutePath + "/idx"
    val idx2 = dir.getAbsolutePath + "/idx2"
    PhashIngest.processBatch(media(0L until 8L), 0L, idx)
    PhashIngest.processBatch(media(8L until 12L), 1L, idx)

    // compact both tables into a new index root, then carry the replay
    // state the way the BatchMarker header prescribes: the _batches
    // markers and the O(1) has_data sentinels travel with the data
    graft.sinks.Compaction.compactPartitions(spark, s"$idx/sigs", s"$idx2/sigs",
      targetBytes = 128L * 1024 * 1024)
    graft.sinks.Compaction.compactPartitions(spark, s"$idx/pairs", s"$idx2/pairs",
      targetBytes = 128L * 1024 * 1024)
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(idx).getFileSystem(conf)
    def cp(rel: String) = org.apache.hadoop.fs.FileUtil.copy(
      fs, new org.apache.hadoop.fs.Path(s"$idx/$rel"),
      fs, new org.apache.hadoop.fs.Path(s"$idx2/$rel"), false, conf)
    cp("_batches"); cp("sigs/_batches_has_data"); cp("pairs/_batches_has_data")

    // a replay of a landed batch still short-circuits on the copy
    val pairsBefore = PhashIngest.readPairs(spark, idx2).count()
    PhashIngest.processBatch(media(8L until 12L), 1L, idx2)
    assert(PhashIngest.readPairs(spark, idx2).count() === pairsBefore,
      "replay re-appended on the compacted index")

    // and a NEW batch pairs correctly against the compacted history
    PhashIngest.processBatch(media(12L until 16L), 2L, idx2)
    val got = PhashIngest.readPairs(spark, idx2)
      .select("doc_a", "doc_b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val want = Dedup.hammingPairsHiLo(allSigs(0L until 16L),
        maxHamming = 3, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    assert(got === want,
      "post-compaction accumulation diverged from the all-pairs set")
  }

  test("corrupt payloads are dropped before pairing and indexing; an " +
      "empty batch commits its markers and writes nothing") {
    val dir = Files.createTempDirectory("phash_corrupt").toFile
    dir.deleteOnExit()
    val idx = dir.getAbsolutePath
    val good = media(Seq(0L, 1L))
    val bad = Seq((999L, "not-a-png".getBytes("UTF-8"), "image/png"))
      .toDF("media_id", "payload", "media_type")
    PhashIngest.processBatch(good.unionByName(bad), 0L, idx)
    val sigs = PhashIngest.readSigs(spark, idx).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(sigs === Set(0L, 1L), "a corrupt payload reached the index")

    val empty = good.limit(0)
    PhashIngest.processBatch(empty, 1L, idx)
    assert(BatchMarker.landed(spark, idx, "pairs", 1L))
    assert(BatchMarker.landed(spark, idx, "sigs", 1L))
    assert(PhashIngest.readSigs(spark, idx).count() === 2)
  }
}
