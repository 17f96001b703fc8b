package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HttpEnrichmentSpec extends SparkSpec {
  import spark.implicits._

  test("fetchMisses: only cache misses hit the fetcher; failures flagged (resources.py:184-218)") {
    val keys  = Seq("10.1/a", "10.1/b", "10.1/c").toDF("key")
    val cache = Seq(("10.1/a", "cached")).toDF("key", "value")
    val fake: String => Option[String] =
      k => if (k.endsWith("b")) Some(s"meta-for-$k") else None

    val fetched = HttpEnrichment.fetchMisses(keys, cache, fake, maxPerSecond = 1e6)
      .collect().map(f => f.key -> f).toMap
    assert(fetched.size === 2) // 'a' was cached → not fetched
    assert(fetched("10.1/b").ok && fetched("10.1/b").value === "meta-for-10.1/b")
    assert(!fetched("10.1/c").ok)
  }

  test("mergeCache: fresh values win, cache rows preserved") {
    val cache = Seq(("a", "old"), ("b", "keep")).toDF("key", "value")
    val keys  = Seq("a", "c").toDF("key")
    // force-fetch 'a' too by passing an empty cache to fetchMisses
    val fetched = HttpEnrichment.fetchMisses(keys, cache.limit(0),
      k => Some(s"new-$k"), maxPerSecond = 1e6)
    val merged = HttpEnrichment.mergeCache(cache, fetched)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(merged === Map("a" -> "new-a", "b" -> "keep", "c" -> "new-c"))
  }
}
