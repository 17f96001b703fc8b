package graft.streaming

import graft.SparkSpec
import graft.operators.Retrieval
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

class IndexIngestSpec extends SparkSpec {
  import spark.implicits._

  private val batch1 = Seq(
    (1L, "apple banana cherry apple"),
    (2L, "apple banana banana banana"))
  private val batch2 = Seq(
    (3L, "cherry cherry durian elderberry"),
    (4L, "fig grape apple banana cherry durian"))
  private val queries = Seq((100L, "apple cherry")).toDF("query_id", "qtext")

  test("streamed index accumulates batches and searches like the one-shot build") {
    val dir = Files.createTempDirectory("idxingest").toFile
    dir.deleteOnExit()
    val idx = dir.getAbsolutePath + "/index"
    val cp = dir.getAbsolutePath + "/cp"

    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")

    val q = IndexIngest.start(docs, idx, cp)
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      // searchable mid-stream: stats derive from what has arrived so far
      assert(IndexIngest.bm25TopK(spark, idx, queries, k = 10).count() > 0)

      input.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = IndexIngest.bm25TopK(spark, idx, queries, k = 10)
      .collect().map(_.toSeq).toSet
    val (p, d) = Retrieval.invertedIndex(
      (batch1 ++ batch2).toDF("doc_id", "text"), "text", "doc_id")
    val oneShot = Retrieval.bm25TopK(p, d, queries, k = 10)
      .collect().map(_.toSeq).toSet
    assert(streamed === oneShot)
  }

  test("batchId replay is a no-op; a half-landed batch completes its pair") {
    val dir = Files.createTempDirectory("idxreplay").toFile
    dir.deleteOnExit()
    val idx = dir.getAbsolutePath + "/index"

    IndexIngest.processBatch(batch1.toDF("doc_id", "text"), 0L, idx)
    val postings0 = spark.read.parquet(s"$idx/postings").count()

    // full replay of a landed batch: no duplicate rows
    IndexIngest.processBatch(batch1.toDF("doc_id", "text"), 0L, idx)
    assert(spark.read.parquet(s"$idx/postings").count() === postings0)

    // crash window: doclens landed for batch 1, postings did not — the
    // replay skips doclens and completes postings
    val (p1, d1) = Retrieval.invertedIndex(
      batch2.toDF("doc_id", "text"), "text", "doc_id")
    d1.withColumn("batch_id", org.apache.spark.sql.functions.lit(1L))
      .write.mode("append").partitionBy("batch_id").parquet(s"$idx/doclens")
    val doclens1 = spark.read.parquet(s"$idx/doclens").count()
    IndexIngest.processBatch(batch2.toDF("doc_id", "text"), 1L, idx)
    assert(spark.read.parquet(s"$idx/doclens").count() === doclens1) // no dup
    assert(spark.read.parquet(s"$idx/postings")
      .filter("batch_id = 1").count() === p1.count())

    // and the completed index searches exactly like the one-shot build
    val streamed = IndexIngest.bm25TopK(spark, idx, queries, k = 10)
      .collect().map(_.toSeq).toSet
    val (pa, da) = Retrieval.invertedIndex(
      (batch1 ++ batch2).toDF("doc_id", "text"), "text", "doc_id")
    val oneShot = Retrieval.bm25TopK(pa, da, queries, k = 10)
      .collect().map(_.toSeq).toSet
    assert(streamed === oneShot)
  }

  test("partitioned streamed index: batches append under tok_bucket= dirs, " +
      "later batches ignore a changed bucket parameter, and the pruned " +
      "search equals the flat streamed search") {
    val dir = Files.createTempDirectory("idxpart").toFile
    dir.deleteOnExit()
    val idx = dir.getAbsolutePath + "/index"

    IndexIngest.processBatchPartitioned(
      batch1.toDF("doc_id", "text"), 0L, idx, nBuckets = 4)
    // a later batch passing a DIFFERENT nBuckets must still bucket with
    // the meta table's 4 — the layout is self-describing, the parameter
    // is first-batch-only
    IndexIngest.processBatchPartitioned(
      batch2.toDF("doc_id", "text"), 1L, idx, nBuckets = 99)

    val bucketDirs = new java.io.File(idx + "/postings")
      .listFiles().filter(_.getName.startsWith("tok_bucket="))
    assert(bucketDirs.nonEmpty, "no tok_bucket= partition directories")
    assert(spark.read.parquet(s"$idx/postings")
      .select("tok_bucket").distinct().collect()
      .forall(_.getInt(0) < 4), "a batch bucketed outside the meta layout")

    // replay of a landed batch stays a no-op under the partitioned writer
    val n0 = spark.read.parquet(s"$idx/postings").count()
    IndexIngest.processBatchPartitioned(
      batch1.toDF("doc_id", "text"), 0L, idx, nBuckets = 4)
    assert(spark.read.parquet(s"$idx/postings").count() === n0)

    // a partial mid-commit crash (one bucket dir landed, no marker) is
    // repaired on replay — the BatchMarker protocol deletes the partial
    // dirs and rewrites the whole batch exactly once
    val partial = new java.io.File(s"$idx/postings/tok_bucket=0/batch_id=7")
    assert(partial.mkdirs())
    val junk = new java.io.File(partial, "part-junk.parquet")
    assert(junk.createNewFile())
    IndexIngest.processBatchPartitioned(
      Seq((9L, "apple kumquat")).toDF("doc_id", "text"), 7L, idx, nBuckets = 4)
    assert(!junk.exists(), "partial-commit debris survived the replay")
    assert(spark.read.parquet(s"$idx/postings")
      .filter("batch_id = 7").count() === 2) // apple + kumquat postings

    val flatIdx = dir.getAbsolutePath + "/flat"
    IndexIngest.processBatch(batch1.toDF("doc_id", "text"), 0L, flatIdx)
    IndexIngest.processBatch(batch2.toDF("doc_id", "text"), 1L, flatIdx)
    IndexIngest.processBatch(
      Seq((9L, "apple kumquat")).toDF("doc_id", "text"), 7L, flatIdx)
    val pruned = IndexIngest.bm25TopKPruned(spark, idx, queries, k = 10)
      .collect().map(_.toSeq).toSet
    val flat = IndexIngest.bm25TopK(spark, flatIdx, queries, k = 10)
      .collect().map(_.toSeq).toSet
    assert(pruned === flat, "pruned streamed search diverged")
  }
}
