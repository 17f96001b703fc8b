package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.DoiNetwork

/** Stage-level timing of doi_network_stages' components (the suite's most
  * expensive query): times the records/cache fixture construction and the
  * resolve separately, then slices the resolve. Diagnostics only.
  * usage: DoiProbe <sfDir> [runs]
  */
object DoiProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val runs = if (args.length > 1) args(1).toInt else 4
    val spark = graft.GraftSession.get("local[32]", shufflePartitions = 32)

    def m(c: Column, n: Int) = pmod(c, lit(n))
    val o = col("o_orderkey")
    val pii = concat(lit("S"), upper(substring(md5(o.cast("string")), 1, 16)))
    val camId = upper(substring(md5(o.cast("string")), 1, 12))
    val url = when(m(o, 6) === 0, concat(lit("see elsevier ref "), pii))
      .when(m(o, 6) === 1, concat(
        lit("http://www.ingentaconnect.com/content/brill/ctz/"),
        lit(1990) + m(o, 30), lit("/12/34/art"), lit(10000) + m(o, 90)))
      .when(m(o, 6) === 2, concat(
        lit("http://zookeys.pensoft.net/articles.php?version=2&id="), m(o, 9000)))
      .when(m(o, 6) === 3, concat(
        lit("https://subtbiol.pensoft.net/articles/"), m(o, 9000)))
      .when(m(o, 6) === 4, concat(
        lit("https://www.ncbi.nlm.nih.gov/pmc/articles/PMC"),
        lit(1000000) + m(o, 9000000)))
      .otherwise(concat(lit("www.cambridge.org/core/product/"), camId))
    def records = graft.sources.Tables.load(spark, sfDir, "orders")
      .select(o.cast("bigint").as("id"), url.as("url"),
        m(o, 6).cast("int").as("kind"))
    val body = when(col("kind") === 0, concat(
        lit("<coredata><prism:doi>10.1016/j."),
        lower(DoiNetwork.elsevierPii(col("url"))),
        lit("</prism:doi></coredata>")))
      .when(col("kind") === 1, concat(lit("@article{a, doi = {10.1644/"),
        regexp_extract(col("url"), "art(\\d+)", 1), lit("}}")))
      .when(col("kind") === 2 || col("kind") === 3,
        concat(lit("@article{a, doi = {10.3897/zk."),
          regexp_extract(col("url"), "(\\d+)$", 1), lit("}}")))
      .when(col("kind") === 4, concat(lit("""[{"doi": "10.1093/pm"""),
        DoiNetwork.pubmedPmc(col("url")), lit("\"}]")))
      .otherwise(concat(lit("@article{a, doi = {10.1017/"),
        regexp_extract(col("url"), "product/([A-F0-9]+)", 1), lit("}}")))
    val key = when(col("kind") === 0,
        concat(lit("elsevier:"), DoiNetwork.elsevierPii(col("url"))))
      .when(col("kind") === 1,
        concat(lit("ingenta:"), DoiNetwork.ingentaPath(col("url"))))
      .when(col("kind") === 2 || col("kind") === 3,
        concat(lit("pensoft:"), DoiNetwork.pensoftRequest(col("url"))))
      .when(col("kind") === 4,
        concat(lit("pubmed:PMC"), DoiNetwork.pubmedPmc(col("url"))))
      .otherwise(concat(lit("cambridge:"), DoiNetwork.cambridgeUrl(col("url"))))
    def cache = records.select(key.as("key"), body.as("body"))
      .filter(col("key").isNotNull).distinct()

    def time(name: String)(df: => DataFrame): Unit = {
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.count()
        val s = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        s
      }
      println(f"[$name] " + ts.map(t => f"$t%.2f").mkString(" "))
    }

    time("records_only")(records)
    time("cache_only")(cache)
    time("kv_no_distinct")(
      records.select(key.as("key"), body.as("body"))
        .filter(col("key").isNotNull))
    time("key_only")(
      records.select(key.as("key")).filter(col("key").isNotNull))
    time("body_only")(records.select(body.as("body")))
    time("key_no_filter")(records.select(key.as("key")))
    time("key_one_recognizer")(
      records.select(concat(lit("elsevier:"),
        DoiNetwork.elsevierPii(col("url"))).as("key")))
    time("key_chain_cheap")(
      records.select(when(col("kind") === 0, lit("a"))
        .when(col("kind") === 1, lit("b"))
        .when(col("kind") === 2 || col("kind") === 3, lit("c"))
        .when(col("kind") === 4, lit("d"))
        .otherwise(lit("e")).as("key")))
    time("pensoft_only")(
      records.select(DoiNetwork.pensoftRequest(col("url")).as("key")))
    time("cambridge_only")(
      records.select(DoiNetwork.cambridgeUrl(col("url")).as("key")))
    time("ingenta_only")(
      records.select(DoiNetwork.ingentaPath(col("url")).as("key")))
    time("pubmed_only")(
      records.select(DoiNetwork.pubmedPmc(col("url")).as("key")))
    time("distinct_only")(
      records.select(col("url").as("key"), col("url").as("body")).distinct())
    time("keyed_battery") {
      val raw = col("url")
      records
        .withColumn("k_elsevier", DoiNetwork.elsevierPii(raw))
        .withColumn("k_cambridge", DoiNetwork.cambridgeUrl(raw))
        .withColumn("k_ingenta", DoiNetwork.ingentaPath(raw))
        .withColumn("k_pensoft", DoiNetwork.pensoftRequest(raw))
        .withColumn("k_pubmed", DoiNetwork.pubmedPmc(raw))
    }
    time("resolve_no_sort")(
      DoiNetwork.resolveFromCachesMelted(records, "url", "id", cache))
    time("full_with_sort")(
      DoiNetwork.resolveFromCachesMelted(records, "url", "id", cache)
        .orderBy("id"))
    spark.stop()
  }
}
