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
}
