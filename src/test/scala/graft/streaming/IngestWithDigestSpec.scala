package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

class IngestWithDigestSpec extends SparkSpec {
  import spark.implicits._

  test("foreachBatch ingest dedups against the whole history, idempotently") {
    val dir = Files.createTempDirectory("digest").toFile
    dir.deleteOnExit()
    val corpus = dir.getAbsolutePath + "/corpus"
    val digest = dir.getAbsolutePath + "/digest"
    val cp = dir.getAbsolutePath + "/cp"

    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")

    val q = IngestWithDigest.start(docs, corpus, digest, cp)
    try {
      // batch 1: two docs + an intra-batch dup (doc 3 repeats doc 1)
      input.addData((1L, "alpha"), (2L, "beta"), (3L, "alpha"))
      q.processAllAvailable()
      assert(spark.read.parquet(corpus).count() === 2)

      // batch 2: a HISTORICAL dup (beta) and a new doc — watermark-free
      // history dedup is the point: beta arrived in an earlier batch
      input.addData((4L, "beta"), (5L, "gamma"))
      q.processAllAvailable()
      val ids = spark.read.parquet(corpus).select("doc_id")
        .as[Long].collect().toSet
      assert(ids === Set(1L, 2L, 5L))
    } finally q.stop()

    // idempotency: replaying an already-landed batchId is a no-op
    val replay = Seq((9L, "delta")).toDF("doc_id", "text")
    IngestWithDigest.processBatch(replay, batchId = 1L, corpus, digest)
    assert(spark.read.parquet(corpus).count() === 3, "replayed batchId re-appended")

    // a genuinely new batchId with a new doc still lands
    IngestWithDigest.processBatch(replay, batchId = 7L, corpus, digest)
    assert(spark.read.parquet(corpus).select("doc_id").as[Long].collect().toSet
      === Set(1L, 2L, 5L, 9L))
  }

  test("null text and empty text stay distinct; nulls dedup against nulls") {
    val dir = Files.createTempDirectory("digest_null").toFile
    dir.deleteOnExit()
    val corpus = dir.getAbsolutePath + "/corpus"
    val digest = dir.getAbsolutePath + "/digest"

    // batch 0: a null-text doc and an empty-text doc — DIFFERENT digest
    // keys (sentinel vs md5('')), so both land
    val b0 = Seq((1L, null: String), (2L, "")).toDF("doc_id", "text")
    IngestWithDigest.processBatch(b0, 0L, corpus, digest)
    assert(spark.read.parquet(corpus).select("doc_id").as[Long].collect().toSet
      === Set(1L, 2L))

    // batch 1: another null and another empty — both are HISTORICAL dups
    // (null matched the sentinel, empty matched md5('')), plus a live doc
    val b1 = Seq((3L, null: String), (4L, ""), (5L, "live")).toDF("doc_id", "text")
    IngestWithDigest.processBatch(b1, 1L, corpus, digest)
    assert(spark.read.parquet(corpus).select("doc_id").as[Long].collect().toSet
      === Set(1L, 2L, 5L))
  }

  test("a crash before the FIRST append (directory holds only _temporary " +
      "debris) replays to completion instead of crash-looping") {
    val dir = Files.createTempDirectory("digest_debris").toFile
    dir.deleteOnExit()
    val corpus = dir.getAbsolutePath + "/corpus"
    val digest = dir.getAbsolutePath + "/digest"

    // simulate a hard crash mid-first-write: the sink dirs exist but hold
    // no readable parquet — read.parquet throws "unable to infer schema"
    new java.io.File(corpus, "_temporary/0").mkdirs()
    new java.io.File(digest, "_temporary/0").mkdirs()

    val b0 = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    IngestWithDigest.processBatch(b0, batchId = 0L, corpus, digest)
    assert(spark.read.parquet(corpus).count() === 2)
    assert(spark.read.parquet(digest).count() === 2)

    // and the replay of that completed batch is still a no-op
    IngestWithDigest.processBatch(b0, batchId = 0L, corpus, digest)
    assert(spark.read.parquet(corpus).count() === 2)
  }

  test("a crash between the corpus and digest appends replays without " +
      "duplicating the corpus") {
    val dir = Files.createTempDirectory("digest_crash").toFile
    dir.deleteOnExit()
    val corpus = dir.getAbsolutePath + "/corpus"
    val digest = dir.getAbsolutePath + "/digest"

    IngestWithDigest.processBatch(
      Seq((1L, "alpha")).toDF("doc_id", "text"), batchId = 0L, corpus, digest)

    // simulate batch 1 crashing AFTER its corpus append, BEFORE its digest
    // append (the non-atomic window): corpus has the stamped rows, digest
    // does not know the batch
    val b1 = Seq((2L, "beta")).toDF("doc_id", "text")
    b1.withColumn("batch_id", lit(1L))
      .write.mode("append").partitionBy("batch_id").parquet(corpus)

    // checkpoint replay of batch 1: corpus must NOT double-append; the
    // digest append must complete the pair
    IngestWithDigest.processBatch(b1, batchId = 1L, corpus, digest)
    assert(spark.read.parquet(corpus).filter(col("batch_id") === 1L).count() === 1,
      "replay duplicated the corpus rows of the crashed batch")
    assert(spark.read.parquet(digest).filter(col("batch_id") === 1L).count() === 1,
      "replay did not complete the digest append")

    // a second full replay is a complete no-op
    IngestWithDigest.processBatch(b1, batchId = 1L, corpus, digest)
    assert(spark.read.parquet(corpus).count() === 2)
    assert(spark.read.parquet(digest).count() === 2)
  }
}
