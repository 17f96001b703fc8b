package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the table-maintenance pass every long-lived
  * dataset needs: streaming sinks, incremental appends and over-parallel
  * writers leave directories of thousands of KB-sized parquet files, and at
  * read time each file costs a listing entry, an open, a footer fetch and a
  * scheduler task. Compaction rewrites the directory into files of
  * ~`targetBytes` so scan parallelism is governed by data size again
  * (the same job `OPTIMIZE` does in lakehouse table formats).
  *
  * Physics: the file count is derived from the ACTUAL on-disk byte size
  * (Hadoop `FileSystem` listing — no data read), and the rewrite uses
  * `coalesce`, which merges input splits task-side WITHOUT a shuffle: each
  * output task streams several input files and writes one output file, so
  * the whole pass is one read + one write, no exchange. The scan is sized
  * to the job: `maxPartitionBytes` is set to `targetBytes` (and the
  * open-cost padding to 0) for the duration of the rewrite, so Spark's
  * file packing itself bins the small files into ~targetBytes splits and
  * `coalesce` only trims the bin-packing remainder — without this, the
  * session default (128 MB splits) would silently floor the output count
  * and write files far above target.
  *
  * At 100 TB this runs per partition directory (date/source), not over the
  * whole table: pass each partition's path and compact the partitions in
  * parallel jobs; untouched partitions cost nothing.
  */
object Compaction {

  /** What a compaction pass did: file counts and bytes before, files after. */
  final case class CompactionStats(filesBefore: Int, bytesBefore: Long, filesAfter: Int)

  /** Rewrite the parquet directory `inDir` into ⌈bytes/targetBytes⌉ files at
    * `outDir`. Returns the before/after stats (the after count is the
    * planned count; coalesce cannot exceed the scan's split count, so a
    * directory already compact stays at its natural file count).
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long): CompactionStats = {
    require(targetBytes > 0, "targetBytes must be positive")
    val path = new Path(inDir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    val entries = fs.listStatus(path).toIndexedSeq
    // a k=v subdirectory means THIS dir is not a leaf: reading it whole
    // would hive-discover the inner partition column, materialize it into
    // the data files and flatten the inner directories — a silent layout
    // change for partition-pruned readers. compactPartitions recurses to
    // the leaves; refuse the misuse here instead of corrupting the layout.
    val nested = entries.filter(s => s.isDirectory && s.getPath.getName.contains("="))
    require(nested.isEmpty,
      s"$inDir holds partition subdirectories (${nested.map(_.getPath.getName).take(3).mkString(", ")}…) — " +
        "compact() is for leaf directories; use compactPartitions, which recurses")
    val dataFiles = entries
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val bytes = dataFiles.map(_.getLen).sum
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val conf = spark.conf
    val prevMax = conf.getOption("spark.sql.files.maxPartitionBytes")
    val prevCost = conf.getOption("spark.sql.files.openCostInBytes")
    try {
      conf.set("spark.sql.files.maxPartitionBytes", targetBytes.toString)
      conf.set("spark.sql.files.openCostInBytes", "0")
      spark.read.parquet(inDir)
        .coalesce(nFiles)
        .write.mode("overwrite").parquet(outDir)
    } finally {
      prevMax.fold(conf.unset("spark.sql.files.maxPartitionBytes"))(
        conf.set("spark.sql.files.maxPartitionBytes", _))
      prevCost.fold(conf.unset("spark.sql.files.openCostInBytes"))(
        conf.set("spark.sql.files.openCostInBytes", _))
    }
    CompactionStats(dataFiles.size, bytes, nFiles)
  }

  /** Per-partition compaction of a hive-partitioned table — the form the
    * header note prescribes at scale: each LEAF `k=v` directory compacts
    * as its own one-read-one-write job into the SAME relative path under
    * `outDir`. Nested layouts (`date=…/source=…`, a streamed index's
    * `tok_bucket=…/batch_id=…`) recurse to the leaves, so every level of
    * the partition tree is preserved and partition-pruned readers — and a
    * streamed sink's `batch_id=` replay-guard directories — keep working
    * on the compacted copy. Reading a leaf sees no partition
    * subdirectories, so data columns pass through byte-for-byte (the
    * partition columns live in the directory names, never in the files —
    * exactly as the writer laid them out). Directories already compact
    * cost one listing each; non-partition entries (`_SUCCESS`, loose
    * files) are not data-bearing here and are skipped. Returned keys are
    * the leaf-relative paths (`tok_bucket=3/batch_id=0`).
    */
  def compactPartitions(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long): Map[String, CompactionStats] = {
    val root = new Path(inDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    def walk(rel: String): Seq[(String, CompactionStats)] = {
      val dir = if (rel.isEmpty) root else new Path(root, rel)
      fs.listStatus(dir).toIndexedSeq
        .filter(s => s.isDirectory && s.getPath.getName.contains("="))
        .flatMap { s =>
          val childRel =
            if (rel.isEmpty) s.getPath.getName else s"$rel/${s.getPath.getName}"
          val hasSub = fs.listStatus(s.getPath)
            .exists(d => d.isDirectory && d.getPath.getName.contains("="))
          if (hasSub) walk(childRel)
          else Seq(childRel ->
            compact(spark, s"$inDir/$childRel", s"$outDir/$childRel", targetBytes))
        }
    }
    walk("").toMap
  }
}
