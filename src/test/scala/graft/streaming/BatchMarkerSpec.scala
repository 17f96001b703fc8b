package graft.streaming

import java.nio.file.Files

import graft.SparkSpec

class BatchMarkerSpec extends SparkSpec {
  import spark.implicits._

  test("a marker-less sink holding committed batches is refused; fresh and marker-era sinks pass") {
    val dir = Files.createTempDirectory("bmguard").toFile
    dir.deleteOnExit()
    val corpus = dir.getAbsolutePath + "/corpus"
    val digest = dir.getAbsolutePath + "/digest"
    val docs = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")

    // fresh sinks: first batch passes and stamps markers
    IngestWithDigest.processBatch(docs, 0L, corpus, digest)
    assert(new java.io.File(s"$corpus/_batches/corpus_0").exists())
    assert(new java.io.File(s"$digest/_batches/digest_0").exists())

    // marker-era sink: later batches pass
    IngestWithDigest.processBatch(
      Seq((3L, "gamma")).toDF("doc_id", "text"), 1L, corpus, digest)
    assert(spark.read.parquet(corpus).count() === 3)

    // legacy sink: committed batch dirs, no _batches → refuse, don't
    // silently replay every batch as never-landed
    val legacy = dir.getAbsolutePath + "/legacy"
    Seq((9L, "old")).toDF("doc_id", "text")
      .withColumn("batch_id", org.apache.spark.sql.functions.lit(0L))
      .write.partitionBy("batch_id").parquet(legacy)
    val e = intercept[IllegalStateException](
      IngestWithDigest.processBatch(docs, 1L, legacy, digest))
    assert(e.getMessage.contains("_batches"))
  }

  test("a first batch crashing between append and marker replays, not wedges") {
    val dir = Files.createTempDirectory("bmfirst").toFile
    dir.deleteOnExit()
    val corpus = dir.getAbsolutePath + "/corpus"
    val digest = dir.getAbsolutePath + "/digest"
    val docs = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")

    // simulate the crash window: the protocol dir exists (created before
    // any append), the corpus batch dir landed, but no marker was written
    BatchMarker.ensureProtocol(spark, corpus)
    docs.withColumn("batch_id", org.apache.spark.sql.functions.lit(0L))
      .write.mode("append").partitionBy("batch_id").parquet(corpus)

    // the replay must repair (delete + rewrite), NOT throw the legacy
    // guard and NOT duplicate
    IngestWithDigest.processBatch(docs, 0L, corpus, digest)
    assert(spark.read.parquet(corpus).filter("batch_id = 0").count() === 2)
    assert(new java.io.File(s"$corpus/_batches/corpus_0").exists())
  }

  test("the digest marker->sentinel crash window self-repairs on replay") {
    val dir = Files.createTempDirectory("bmsent").toFile
    dir.deleteOnExit()
    val corpus = dir.getAbsolutePath + "/corpus"
    val digest = dir.getAbsolutePath + "/digest"
    val docs = Seq((1L, "alpha")).toDF("doc_id", "text")
    IngestWithDigest.processBatch(docs, 0L, corpus, digest)
    val sentinel = new java.io.File(s"$digest/_batches/has_data")
    assert(sentinel.exists())
    // simulate the crash: marker committed, sentinel lost
    assert(sentinel.delete())
    IngestWithDigest.processBatch(docs, 0L, corpus, digest) // replay
    assert(sentinel.exists(), "replay did not restore the has_data sentinel")
    // and history dedup works for the next batch
    IngestWithDigest.processBatch(
      Seq((9L, "alpha")).toDF("doc_id", "text"), 1L, corpus, digest)
    assert(spark.read.parquet(corpus).count() === 1) // dup never ingested
  }

  test("null-text docs dedup consistently within and across batches") {
    val dir = Files.createTempDirectory("bmnull").toFile
    dir.deleteOnExit()
    val corpus = dir.getAbsolutePath + "/corpus"
    val digest = dir.getAbsolutePath + "/digest"
    IngestWithDigest.processBatch(
      Seq((1L, null), (2L, null), (3L, "real")).toDF("doc_id", "text"),
      0L, corpus, digest)
    // intra-batch: the two no-content docs collapse to the smallest id
    assert(spark.read.parquet(corpus).count() === 2)
    // cross-batch: a later no-content doc is deduped against history too
    IngestWithDigest.processBatch(
      Seq((9L, null)).toDF("doc_id", "text"), 1L, corpus, digest)
    assert(spark.read.parquet(corpus).count() === 2)
  }
}
