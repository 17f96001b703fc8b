package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** Production fetcher for [[HttpEnrichment]] (S7/S8/F14): the live-client
  * counterpart of the injected fakes used in zero-egress test runs. The
  * reference's analog is the `requests.get` loop of
  * /root/reference/synth/resources.py:184-218 (Crossref DOI metadata) and
  * :259-302 (bibliographic search).
  *
  * Spark-shape notes:
  *  - the instance is SERIALIZABLE but the JDK client is `@transient
  *    lazy` — each executor builds its own client on first use; nothing
  *    network-bound crosses the wire in the closure;
  *  - non-2xx and transport errors map to `None` (the reference treats
  *    fetch failures as cache misses to retry next run, resources.py:216);
  *  - pair with `HttpEnrichment.fetchMisses`, which already anti-joins the
  *    cache and rate-limits per partition — this class does exactly one
  *    GET per call and nothing else.
  *
  * @param urlFor   maps a key (e.g. a DOI) to the request URL
  * @param headers  constant request headers (e.g. mailto-tagged UA, the
  *                 polite-pool convention for Crossref)
  */
class HttpFetcher(
    urlFor: String => String,
    headers: Map[String, String] = Map.empty,
    timeoutMillis: Long = 10000L)
    extends (String => Option[String]) with Serializable {

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder()
      .connectTimeout(Duration.ofMillis(timeoutMillis))
      .followRedirects(HttpClient.Redirect.NORMAL)
      .build()

  override def apply(key: String): Option[String] =
    try {
      val builder = HttpRequest.newBuilder(URI.create(urlFor(key)))
        .timeout(Duration.ofMillis(timeoutMillis))
        .GET()
      headers.foreach { case (k, v) => builder.header(k, v) }
      val resp = client.send(builder.build(), HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() / 100 == 2) Some(resp.body()) else None
    } catch {
      case _: InterruptedException =>
        // preserve cancellation: Spark interrupts the task thread to kill
        // it — clearing the flag would keep the rate-limited partition
        // loop fetching for minutes after the job is cancelled
        Thread.currentThread().interrupt()
        None
      case _: java.io.IOException => None
      // a key that doesn't form a legal URI is a miss, not a job-killer
      // (one malformed DOI must not fail the whole cache refresh)
      case _: IllegalArgumentException => None
    }
}
