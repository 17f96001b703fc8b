package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class ShardWriterSpec extends SparkSpec {

  test("writeShards: one file per shard, rows in shuffled order, reproducible") {
    val dir = Files.createTempDirectory("shards").toFile
    dir.deleteOnExit()
    val path = dir.getAbsolutePath + "/out"
    val df = spark.range(0, 400).withColumnRenamed("id", "doc_id")

    ShardWriter.writeShards(df, "doc_id", nShards = 4, path)

    // every shard directory exists and holds exactly one parquet file
    val shardDirs = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("shard=")).sortBy(_.getName)
    assert(shardDirs.map(_.getName).toSeq ===
      Seq("shard=0", "shard=1", "shard=2", "shard=3"))
    shardDirs.foreach { d =>
      val parts = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parts.length === 1, s"${d.getName} has ${parts.length} files")
    }

    // full read-back: nothing lost, nothing duplicated
    val back = spark.read.parquet(path)
    assert(back.count() === 400)
    assert(back.select("doc_id").distinct().count() === 400)

    // within a shard file, physical row order IS shard_pos order (the
    // loader can stream sequentially with no sort)
    val one = spark.read.parquet(path + "/shard=2")
      .select("shard_pos").collect().map(_.getLong(0))
    assert(one.toSeq === one.sorted.toSeq)
    assert(one.head === 1L && one.last === one.length.toLong)

    // reproducible: a second write yields the identical doc_id sequence
    val path2 = dir.getAbsolutePath + "/out2"
    ShardWriter.writeShards(df, "doc_id", nShards = 4, path2)
    val seq1 = spark.read.parquet(path + "/shard=1")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val seq2 = spark.read.parquet(path2 + "/shard=1")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(seq1 === seq2 && seq1.nonEmpty)
  }

  test("writeJsonlShards: one text file per shard, parseable lines, same deal as parquet") {
    val dir = Files.createTempDirectory("jsonl").toFile
    dir.deleteOnExit()
    val path = dir.getAbsolutePath + "/out"
    val df = spark.range(0, 200)
      .select(col("id").as("doc_id"), concat(lit("text-"), col("id")).as("text"))

    ShardWriter.writeJsonlShards(df, "doc_id", nShards = 4, path)

    val shardDirs = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("shard=")).sortBy(_.getName)
    assert(shardDirs.length === 4)
    shardDirs.foreach { d =>
      val parts = d.listFiles().filter(_.getName.startsWith("part-"))
      assert(parts.length === 1, s"${d.getName} has ${parts.length} files")
    }

    // each line is a JSON object carrying the original columns
    val back = spark.read.json(path)
    assert(back.count() === 200)
    assert(back.select("doc_id").distinct().count() === 200)
    assert(back.columns.toSet === Set("doc_id", "text", "shard"))

    // schema-on-read round trip: declared schema, no inference pass
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val declared = ShardWriter.readJsonlShards(spark, path, schema)
    assert(declared.schema.fieldNames.toSet === Set("doc_id", "text", "shard"))
    assert(declared.count() === 200)
    assert(declared.select("doc_id").exceptAll(df.select("doc_id")).count() === 0)

    // the JSONL deal matches the parquet deal: same doc_ids per shard
    val pq = dir.getAbsolutePath + "/pq"
    ShardWriter.writeShards(df, "doc_id", nShards = 4, pq)
    val jsonlShard = back.filter(col("shard") === 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val pqShard = spark.read.parquet(pq + "/shard=2")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(jsonlShard === pqShard && jsonlShard.nonEmpty)
  }

  test("writeZOrdered: per-file min/max tiles prune a 2-D box a single-key sort cannot") {
    val dir = Files.createTempDirectory("zorder").toFile
    dir.deleteOnExit()
    val grid = spark.range(0, 4096)
      .select((col("id") % 64).as("a"), (col("id") / 64).cast("long").as("b"))

    val zPath = dir.getAbsolutePath + "/z"
    ShardWriter.writeZOrdered(grid, "a", "b", nFiles = 16, zPath)
    val aPath = dir.getAbsolutePath + "/bya"
    grid.repartitionByRange(16, col("a"), col("b"))
      .sortWithinPartitions(col("a"), col("b"))
      .write.mode("overwrite").parquet(aPath)

    // per-FILE min/max — exactly the statistics parquet pruning sees
    def overlapping(path: String): Int = {
      val files = new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
      files.count { f =>
        val r = spark.read.parquet(f)
          .agg(min(col("a")), max(col("a")), min(col("b")), max(col("b")))
          .head()
        r.getLong(0) <= 7 && r.getLong(1) >= 0 && r.getLong(2) <= 7 && r.getLong(3) >= 0
      }
    }
    // the box a,b in [0,7]^2: z-order isolates it in one 16x16-tile file;
    // the (a, b) sort clusters a but spans all of b in every file
    assert(overlapping(zPath) === 1)
    assert(overlapping(aPath) >= 2)
    // nothing lost in the clustered write
    assert(spark.read.parquet(zPath).count() === 4096)
  }
}
