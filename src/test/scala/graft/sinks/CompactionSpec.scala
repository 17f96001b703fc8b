package graft.sinks

import graft.SparkSpec
import java.nio.file.Files

class CompactionSpec extends SparkSpec {

  private def parquetFiles(path: String): Array[java.io.File] =
    new java.io.File(path).listFiles().filter(_.getName.endsWith(".parquet"))

  test("compact merges a small-file directory to the byte-derived count, losslessly") {
    val dir = Files.createTempDirectory("compact").toFile
    dir.deleteOnExit()
    val in = dir.getAbsolutePath + "/in"
    val out = dir.getAbsolutePath + "/out"

    spark.range(0, 10000).toDF("id")
      .repartition(32)
      .write.parquet(in)
    val before = parquetFiles(in)
    assert(before.length === 32)

    // target = total bytes / 4 -> plan 4 output files
    val total = before.map(_.length).sum
    val stats = Compaction.compact(spark, in, out, targetBytes = total / 4 + 1)
    assert(stats.filesBefore === 32)
    assert(stats.bytesBefore === total)
    assert(stats.filesAfter === 4)
    assert(parquetFiles(out).length === 4)

    // lossless: same ids, same count
    val back = spark.read.parquet(out)
    assert(back.count() === 10000)
    assert(back.distinct().count() === 10000)

    // no exchange in the rewrite plan: coalesce merges splits task-side
    val plan = spark.read.parquet(in).coalesce(4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"compaction plan shuffles:\n$plan")
  }

  test("an already-compact directory plans one file") {
    val dir = Files.createTempDirectory("compact1").toFile
    dir.deleteOnExit()
    val in = dir.getAbsolutePath + "/in"
    val out = dir.getAbsolutePath + "/out"
    spark.range(0, 100).toDF("id").coalesce(1).write.parquet(in)
    val stats = Compaction.compact(spark, in, out, targetBytes = 1L << 30)
    assert(stats.filesBefore === 1)
    assert(stats.filesAfter === 1)
    assert(spark.read.parquet(out).count() === 100)
  }

  test("compactPartitions: a streamed partitioned index compacts per " +
      "tok_bucket= directory, layout preserved, pruned search unchanged") {
    import spark.implicits._
    val dir = Files.createTempDirectory("compact_part").toFile
    dir.deleteOnExit()
    val idx = dir.getAbsolutePath + "/index"
    val compacted = dir.getAbsolutePath + "/compacted"

    // many small batches -> many small files under each bucket dir
    val batches = Seq(
      Seq((1L, "apple banana cherry"), (2L, "apple banana banana")),
      Seq((3L, "cherry durian elderberry"), (4L, "fig grape apple")),
      Seq((5L, "banana cherry fig"), (6L, "grape apple cherry")))
    batches.zipWithIndex.foreach { case (b, i) =>
      graft.streaming.IndexIngest.processBatchPartitioned(
        b.toDF("doc_id", "text"), i.toLong, idx, nBuckets = 4)
    }

    val stats = Compaction.compactPartitions(
      spark, s"$idx/postings", s"$compacted/postings", targetBytes = 1L << 30)
    assert(stats.nonEmpty && stats.keys.forall(_.startsWith("tok_bucket=")))
    assert(stats.values.forall(_.filesAfter === 1), "buckets not compacted to one file")
    // layout preserved: same partition dirs before and after
    val dirsOf = (p: String) => new java.io.File(p).listFiles()
      .filter(_.getName.startsWith("tok_bucket=")).map(_.getName).toSet
    assert(dirsOf(s"$compacted/postings") === dirsOf(s"$idx/postings"))

    // finish the compacted index (doclens + meta travel as-is) and the
    // pruned search answers identically to the un-compacted original
    Compaction.compact(spark, s"$idx/doclens", s"$compacted/doclens", 1L << 30)
    spark.read.parquet(s"$idx/meta").write.parquet(s"$compacted/meta")
    val queries = Seq((100L, "apple cherry")).toDF("query_id", "qtext")
    val a = graft.streaming.IndexIngest.bm25TopKPruned(spark, idx, queries, k = 10)
      .collect().map(_.toSeq).toSet
    val b = graft.streaming.IndexIngest.bm25TopKPruned(spark, compacted, queries, k = 10)
      .collect().map(_.toSeq).toSet
    assert(a === b, "compaction changed search results")
  }
}
