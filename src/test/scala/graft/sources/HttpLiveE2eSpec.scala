package graft.sources

import java.net.{URLDecoder, URLEncoder}

import graft.SparkSpec
import graft.functions.DoiNetwork
import org.apache.spark.sql.functions._

/** The LIVE half of the network DOI stages, end-to-end with a real socket:
  * an in-process `com.sun.net.httpserver` fixture (loopback only — zero
  * egress, no new dependency) serves canned Crossref-shaped publisher
  * bodies, and the full production loop runs against it — recognizers
  * mint stage keys, [[HttpEnrichment.fetchMisses]] + [[HttpFetcher]]
  * fetch exactly the cache misses over HTTP, and
  * [[DoiNetwork.resolveFromCaches]] parses the accumulated cache. The
  * reference's analog is the requests loop of
  * /root/reference/synth/resources.py:184-302.
  */
class HttpLiveE2eSpec extends SparkSpec {
  import spark.implicits._

  private def withServer(test: (String, java.util.concurrent.atomic.AtomicInteger) => Unit): Unit = {
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/fetch", { exchange =>
      hits.incrementAndGet()
      val key = URLDecoder.decode(
        exchange.getRequestURI.getRawQuery.stripPrefix("key="), "UTF-8")
      def ok(body: String): Unit = {
        val b = body.getBytes("UTF-8")
        exchange.sendResponseHeaders(200, b.length)
        exchange.getResponseBody.write(b)
      }
      // canned per-publisher bodies, shaped like the real responses the
      // reference parses (full-text XML / bibtex downloads / ReFindIt JSON)
      key.takeWhile(_ != ':') match {
        case "elsevier" =>
          ok("<coredata><prism:doi>10.1016/j.fake.2009.01.001</prism:doi></coredata>")
        case "cambridge" => ok("@article{c, doi = {10.1017/S0022112009991234}}")
        case "ingenta"   => ok("@article{i, doi = {10.1642/0004-8038.126.2.1}}")
        case "pensoft"   => ok("@article{p, doi = {10.3897/zookeys.253.3923}}")
        case "pubmed"    => ok("""[{"doi":"10.1371/journal.pone.0012345"}]""")
        case "boom"      => exchange.sendResponseHeaders(500, -1)
        case _           => exchange.sendResponseHeaders(404, -1)
      }
      exchange.close()
    })
    server.start()
    try test(s"http://127.0.0.1:${server.getAddress.getPort}", hits)
    finally server.stop(0)
  }

  test("recognize -> live fetch of misses -> parse cascade, exactly-once per key") {
    withServer { (base, hits) =>
      val fetcher = new HttpFetcher(
        key => s"$base/fetch?key=${URLEncoder.encode(key, "UTF-8")}",
        headers = Map("User-Agent" -> "graft/0.1 (mailto:test@example.org)"))
      val records = Seq(
        (1L, "elsevier pii S0123456789012345 embedded"),
        (2L, "www.cambridge.org/core/journals/jfm/article/abs/x"),
        (3L, "www.ingentaconnect.com/content/aba/2009/00000126/00000002/art00001"),
        (4L, "zookeys.pensoft.net/articles.php?id=2533"),
        (5L, "https://www.ncbi.nlm.nih.gov/pmc/articles/PMC3131912/"),
        (6L, "https://example.com/nothing-recognizable")).toDF("id", "raw")

      // pass 1 over an empty cache exposes the minted stage keys (no rows
      // join, doi stays null) — the to-fetch list is their melt
      val empty = Seq.empty[(String, String)].toDF("key", "body")
      val keyed = DoiNetwork.resolveFromCaches(records, "raw", empty)
      assert(keyed.filter(col("doi").isNotNull).count() === 0)
      val toFetch = keyed.select(explode(array(
          col("k_elsevier"), col("k_cambridge"), col("k_ingenta"),
          col("k_pensoft"), col("k_pubmed"))).as("key"))
        .filter(col("key").isNotNull)

      // the live leg: anti-join + per-partition rate limit + real GETs
      val fetched = HttpEnrichment.fetchMisses(
        toFetch, empty.select("key"), fetcher, maxPerSecond = 1e6)
      val cache = fetched.toDF().filter(col("ok"))
        .select(col("key"), col("value").as("body"))
        .cache()
      assert(cache.count() === 5)
      assert(hits.get === 5, "one GET per distinct recognized key")

      // pass 2 over the live-built cache: every stage parses its body
      val resolved = DoiNetwork.resolveFromCaches(records, "raw", cache)
        .select("id", "doi").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(resolved === Map(
        1L -> "10.1016/j.fake.2009.01.001", // prism:doi is verbatim, not doiRegex-normalized
        2L -> "10.1017/S0022112009991234",
        3L -> "10.1642/0004-8038.126.2.1",
        4L -> "10.3897/ZOOKEYS.253.3923",
        5L -> "10.1371/journal.pone.0012345",
        6L -> null))

      // replay: with the cache populated, NOTHING fetches (U4 anti-join)
      val again = HttpEnrichment.fetchMisses(
        toFetch, cache.select("key"), fetcher, maxPerSecond = 1e6)
      assert(again.count() === 0 && hits.get === 5)
      cache.unpersist()
    }
  }

  test("error paths over the socket: 5xx and malformed URIs are misses") {
    withServer { (base, _) =>
      val fetcher = new HttpFetcher(
        key => s"$base/fetch?key=${URLEncoder.encode(key, "UTF-8")}")
      assert(fetcher("boom:x").isEmpty)     // 500 -> miss, retryable
      assert(fetcher("unknown-stage").isEmpty) // 404 -> miss
      // a key that forms no legal URI is a per-row miss, not a job-killer
      val bad = new HttpFetcher(_ => "http://exa mple.com/x")
      assert(bad("k").isEmpty)
    }
  }

  test("per-partition rate limit paces live requests") {
    withServer { (base, _) =>
      val fetcher = new HttpFetcher(
        key => s"$base/fetch?key=${URLEncoder.encode(key, "UTF-8")}")
      val keys = Seq("pubmed:PMC0000001", "pubmed:PMC0000002",
        "pubmed:PMC0000003", "pubmed:PMC0000004").toDF("key")
      val empty = Seq.empty[(String, String)].toDF("key", "value")
      val t0 = System.nanoTime()
      // 10/s -> 100 ms between calls within a partition; 4 keys over the
      // suite's <=2 shuffle partitions means some partition holds >=2 keys,
      // so at least one inter-call wait must have happened
      val out = HttpEnrichment.fetchMisses(keys, empty, fetcher, maxPerSecond = 10.0)
      assert(out.collect().length === 4)
      val elapsedMs = (System.nanoTime() - t0) / 1e6
      assert(elapsedMs >= 100.0, s"rate limiter never paused (elapsed ${elapsedMs}ms)")
    }
  }
}
