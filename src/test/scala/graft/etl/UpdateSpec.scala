package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** `synth update` analog: cache-refresh semantics (cli.py:77-91). */
object UpdateSpec {
  // JVM-static: task closures are serialized even in local mode, so a
  // captured var would mutate a deserialized copy — a static queue is
  // shared because local-mode tasks run in this JVM
  val fetched = new java.util.concurrent.ConcurrentLinkedQueue[String]()
}

class UpdateSpec extends SparkSpec {
  import spark.implicits._

  test("refreshDoiMetadata: fetches only misses, merges last-write-wins, keeps failures out") {
    val outputs = Seq(
      (1, "10.1/known"), (2, "10.1/new"), (3, "10.1/broken"), (4, null))
      .toDF("id", "doi")
    val cache = Seq(("10.1/known", "cached-meta")).toDF("key", "value")
    UpdateSpec.fetched.clear()
    val fake: String => Option[String] = { k =>
      UpdateSpec.fetched.add(k)
      if (k == "10.1/new") Some(s"meta-$k") else None
    }
    val merged = Update.refreshDoiMetadata(outputs, cache, fake, maxPerSecond = 1e6)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // known was cached → never fetched; null doi filtered out
    import scala.jdk.CollectionConverters._
    assert(UpdateSpec.fetched.asScala.toSet === Set("10.1/new", "10.1/broken"))
    assert(merged === Map("10.1/known" -> "cached-meta", "10.1/new" -> "meta-10.1/new"))
  }
}
