package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}

/** HTTP enrichment source shell (S7/S8; /root/reference/synth/resources.py:
  * 184-218 DOI-metadata fetch, :259-302 bibliographic search).
  *
  * The reference fans out per-key HTTP calls over a 20-thread pool and
  * caches responses in sqlitedict. Spark-first shape:
  *  - the fetch runs inside `mapPartitions`, so one client + rate limiter
  *    per partition, N_partitions × parallelism overall — the cluster IS
  *    the thread pool;
  *  - results land in a cache TABLE (key, value, fetched_ok) that
  *    downstream joins consume (see Steps.cleanOutputs) — the bench/verify
  *    path NEVER performs network I/O, it replays the cache;
  *  - the fetcher is injected, so tests (and this zero-egress container)
  *    run a deterministic fake while production swaps in a real client.
  *
  * At 100 TB the pattern holds: keys-to-fetch is the (small) anti-join of
  * needed keys vs the cache table; only misses fan out.
  */
object HttpEnrichment {

  case class Fetched(key: String, value: String, ok: Boolean)

  /** Fetch all `key` column values not already present in `cache(key)`,
    * with `maxPerSecond` rate limiting per partition.
    */
  def fetchMisses(
      keys: DataFrame, cache: DataFrame,
      fetcher: String => Option[String],
      maxPerSecond: Double = 10.0): Dataset[Fetched] = {
    val misses = keys.select(col("key").cast("string"))
      .distinct()
      .join(cache.select(col("key")), Seq("key"), "left_anti") // U4: only misses
    implicit val enc = Encoders.product[Fetched]
    val minIntervalNanos = (1e9 / maxPerSecond).toLong
    misses.select(col("key")).as(Encoders.STRING).mapPartitions { it =>
      var lastCall = 0L
      it.map { key =>
        // per-partition rate limit (the 20-thread throttle analog)
        val now = System.nanoTime()
        val wait = lastCall + minIntervalNanos - now
        if (wait > 0) Thread.sleep(wait / 1000000, (wait % 1000000).toInt)
        lastCall = System.nanoTime()
        fetcher(key) match {
          case Some(v) => Fetched(key, v, ok = true)
          case None    => Fetched(key, null, ok = false)
        }
      }
    }
  }

  /** Merge newly fetched rows into the cache frame (last-write-wins). */
  def mergeCache(cache: DataFrame, fetched: Dataset[Fetched]): DataFrame = {
    val fresh = fetched.toDF().filter(col("ok")).select(col("key"), col("value"))
    cache.select(col("key"), col("value"))
      .join(fresh.select(col("key")), Seq("key"), "left_anti")
      .unionByName(fresh)
  }
}
