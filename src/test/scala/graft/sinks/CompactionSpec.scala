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
    // leaves of the nested layout: tok_bucket=N/batch_id=M
    assert(stats.nonEmpty && stats.keys.forall(_.startsWith("tok_bucket=")))
    assert(stats.keys.exists(_.contains("/batch_id=")),
      "recursion did not reach the nested batch_id= level")
    assert(stats.values.forall(_.filesAfter === 1), "leaves not compacted to one file")
    // layout preserved at EVERY level: same partition dirs before and after
    val dirsOf = (p: String) => new java.io.File(p).listFiles()
      .filter(_.getName.contains("=")).map(_.getName).toSet
    assert(dirsOf(s"$compacted/postings") === dirsOf(s"$idx/postings"))
    dirsOf(s"$idx/postings").foreach { b =>
      assert(dirsOf(s"$compacted/postings/$b") === dirsOf(s"$idx/postings/$b"),
        s"nested batch_id= dirs changed under $b")
    }

    // finish the compacted index (doclens recurses too — it is batch_id=
    // partitioned — meta travels as-is) and the pruned search answers
    // identically to the un-compacted original
    Compaction.compactPartitions(
      spark, s"$idx/doclens", s"$compacted/doclens", 1L << 30)
    spark.read.parquet(s"$idx/meta").write.parquet(s"$compacted/meta")
    // a compacted copy is the SAME index: its landed-batch markers travel
    // with it (without them the BatchMarker legacy guard refuses replays
    // — correctly, since replay state would otherwise be unknowable)
    locally {
      val src = new java.io.File(s"$idx/_batches")
      val dst = new java.io.File(s"$compacted/_batches")
      dst.mkdirs()
      src.listFiles().foreach(f => java.nio.file.Files.copy(
        f.toPath, new java.io.File(dst, f.getName).toPath))
    }
    val queries = Seq((100L, "apple cherry")).toDF("query_id", "qtext")
    val a = graft.streaming.IndexIngest.bm25TopKPruned(spark, idx, queries, k = 10)
      .collect().map(_.toSeq).toSet
    val b = graft.streaming.IndexIngest.bm25TopKPruned(spark, compacted, queries, k = 10)
      .collect().map(_.toSeq).toSet
    assert(a === b, "compaction changed search results")

    // the compacted copy still partition-prunes: the postings scan of the
    // pruned search carries a non-empty tok_bucket PartitionFilter
    val plan = graft.streaming.IndexIngest
      .bm25TopKPruned(spark, compacted, queries, k = 10)
      .queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator
      .find(l => l.contains("postings") && l.contains("PartitionFilters"))
      .getOrElse(fail(s"no partitioned postings scan in the plan:\n$plan"))
    assert(scanLine.contains("tok_bucket") &&
        !scanLine.contains("PartitionFilters: []"),
      s"compacted postings scan lost its partition filter:\n$scanLine")

    // and the streamed sink's replay guard still holds on the compacted
    // copy: replaying a landed batch against it is a no-op
    val n0 = spark.read.parquet(s"$compacted/postings").count()
    graft.streaming.IndexIngest.processBatchPartitioned(
      batches.head.toDF("doc_id", "text"), 0L, compacted, nBuckets = 4)
    assert(spark.read.parquet(s"$compacted/postings").count() === n0,
      "replay re-appended into the compacted index")
  }

  test("compact refuses a directory with partition subdirectories instead " +
      "of silently flattening the layout") {
    val dir = Files.createTempDirectory("compact_guard").toFile
    dir.deleteOnExit()
    val in = dir.getAbsolutePath + "/in"
    spark.range(0, 100).toDF("id")
      .withColumn("k", org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.col("id"), org.apache.spark.sql.functions.lit(4)))
      .write.partitionBy("k").parquet(in)
    val e = intercept[IllegalArgumentException] {
      Compaction.compact(spark, in, dir.getAbsolutePath + "/out", 1L << 30)
    }
    assert(e.getMessage.contains("compactPartitions"))
  }
}
