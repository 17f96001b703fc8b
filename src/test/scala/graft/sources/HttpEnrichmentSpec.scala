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

  test("HttpFetcher: live client against a loopback server — 2xx body, 404→None, dead port→None") {
    // in-process HTTP server on 127.0.0.1 (no egress): /works/<doi> JSON
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/works/", { exchange =>
      val doi = exchange.getRequestURI.getPath.stripPrefix("/works/")
      if (doi.startsWith("10.")) {
        val body = s"""{"DOI":"$doi","publisher":"Loopback"}""".getBytes("UTF-8")
        exchange.getResponseHeaders.add("Content-Type", "application/json")
        exchange.sendResponseHeaders(200, body.length)
        exchange.getResponseBody.write(body)
      } else exchange.sendResponseHeaders(404, -1)
      exchange.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val fetcher = new HttpFetcher(k => s"$base/works/$k",
        headers = Map("User-Agent" -> "graft/0.1 (mailto:test@example.org)"))
      // through the full Spark path: anti-join + mapPartitions + rate limit
      val keys  = Seq("10.5/x", "10.5/y", "bogus").toDF("key")
      val cache = Seq(("10.5/y", "cached")).toDF("key", "value")
      val out = HttpEnrichment.fetchMisses(keys, cache, fetcher, maxPerSecond = 1e6)
        .collect().map(f => f.key -> f).toMap
      assert(out.size === 2) // y was cached
      assert(out("10.5/x").ok && out("10.5/x").value.contains("\"publisher\":\"Loopback\""))
      assert(!out("bogus").ok) // 404 → miss, retryable next run
      // dead port: transport error maps to None, not an exception
      val dead = new HttpFetcher(k => s"http://127.0.0.1:1/$k", timeoutMillis = 500)
      assert(dead("10.5/x").isEmpty)
    } finally server.stop(0)
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
