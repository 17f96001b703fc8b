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
}
