package graft.etl

import graft.sources.{HttpEnrichment, HttpFetcher}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** `synth update` analog (/root/reference/synth/cli.py:77-91): refresh the
  * enrichment resource caches — in the reference, (re)fetching DOI
  * metadata from Crossref into `doi_metadata.db` over a 20-thread pool.
  *
  * Spark shape: the keys needing refresh are the anti-join of referenced
  * DOIs vs the cache table (only misses fan out), the fetch runs inside
  * the rate-limited `mapPartitions` shell ([[HttpEnrichment.fetchMisses]]
  * — the cluster is the thread pool), and the merged cache is written
  * back as a plain table. Nothing network-bound ever runs in the
  * verify/bench path; this entrypoint is the explicitly-online command.
  */
object Update {

  /** Pure refresh step: fetch cache misses among `outputs`' DOIs, merge
    * last-write-wins into the cache frame. Fetcher injected (live runs
    * pass an [[HttpFetcher]], tests a deterministic fake).
    */
  def refreshDoiMetadata(
      outputs: DataFrame, cache: DataFrame,
      fetcher: String => Option[String],
      maxPerSecond: Double = 10.0): DataFrame = {
    val keys = outputs
      .select(col("doi").as("key"))
      .filter(col("key").isNotNull && length(col("key")) > 0)
    val fetched = HttpEnrichment.fetchMisses(keys, cache, fetcher, maxPerSecond)
    HttpEnrichment.mergeCache(cache, fetched)
  }

  /** CLI: `Update <outputsParquet> <cacheDir> <baseUrl>` — e.g. baseUrl
    * `https://api.crossref.org` fetches `<baseUrl>/works/<doi>`. The cache
    * dir is read if present (else starts empty) and overwritten with the
    * merged result.
    */
  def main(args: Array[String]): Unit = {
    val Array(outputsPath, cacheDir, baseUrl) = args.take(3)
    val spark = graft.GraftSession.get(
      sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]"))
    import spark.implicits._
    val outputs = spark.read.parquet(outputsPath)
    val hconf = spark.sessionState.newHadoopConf()
    def hp(s: String) = new org.apache.hadoop.fs.Path(s)
    val fs = hp(cacheDir).getFileSystem(hconf)
    val cache =
      if (fs.exists(hp(cacheDir))) spark.read.parquet(cacheDir)
      else Seq.empty[(String, String)].toDF("key", "value")
    val fetcher = new HttpFetcher(
      // percent-encode the key: real DOIs contain '<', '>', spaces, '#'
      // (SICI DOIs) — raw interpolation would crash URI parsing or
      // silently truncate the path at '#'
      key => s"$baseUrl/works/" + java.net.URLEncoder.encode(key, "UTF-8"),
      headers = Map("User-Agent" -> "graft/0.1 (mailto:ops@example.org)"))
    val merged = refreshDoiMetadata(outputs, cache, fetcher)
    // write via temp, then swap via RENAMES only (never delete-then-rename:
    // a crash between delete and rename would destroy the only cache copy).
    // Every rename is checked — failing loudly with the data still on disk
    // beats exiting 0 with the cache gone. All through the path's Hadoop
    // FileSystem so the swap works wherever the cache lives (rename is
    // atomic on HDFS/local; object stores degrade to copy — acceptable
    // for a maintenance command that fails loudly).
    val tmp = hp(cacheDir + "_tmp")
    merged.write.mode("overwrite").parquet(tmp.toString)
    val target = hp(cacheDir)
    val backup = hp(cacheDir + "_prev")
    if (fs.exists(backup))
      require(fs.delete(backup, true), s"could not delete stale backup $backup")
    if (fs.exists(target))
      require(fs.rename(target, backup), s"could not move $target aside to $backup")
    require(fs.rename(tmp, target), s"could not move $tmp into place at $target" +
      (if (fs.exists(backup)) s" — previous cache preserved at $backup" else ""))
    spark.stop()
  }
}
