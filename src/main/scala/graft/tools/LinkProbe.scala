package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-off diagnostics main for the warc_links cost regression (r15):
  * times each stage of the link-extraction pipeline in isolation so the
  * expensive expression is measured, not guessed. Not part of the product
  * surface.
  */
object LinkProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.get("local[32]", shufflePartitions = 32)

    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"[$name] rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }

    val path = graft.SparkEntry.warcFixtureForProbe(spark, sfDir)
    val parsed = graft.sources.Warc.httpParsed(
      graft.sources.Warc.responses(
        graft.sources.Warc.readRecords(spark, s"$path/files")).toDF())
      .localCheckpoint()

    time("parse-only")(parsed)
    val hrefs = parsed.filter(col("http_status") === 200)
      .select(col("uri"), explode(graft.functions.HtmlTextColumn.hrefs(col("body"))).as("href"))
    time("hrefs")(hrefs)
    time("hrefs+canon-src")(hrefs
      .select(graft.functions.Url.canonicalizeUrl(col("uri")).as("src_url"), col("href"))
      .filter(col("src_url").isNotNull))
    val resolved = hrefs
      .select(graft.functions.Url.canonicalizeUrl(col("uri")).as("src_url"), col("href"))
      .select(col("src_url"),
        graft.functions.Url.resolveUrl(col("src_url"), col("href")).as("abs_url"))
    time("+resolve-native")(resolved.filter(col("abs_url").isNotNull))
    time("+canon-dst")(resolved
      .select(graft.functions.Url.canonicalizeUrl(col("abs_url")).as("dst_url"))
      .filter(col("dst_url").isNotNull))
    // the full production expression exactly as warcLinkEdges states it
    val full = hrefs
      .select(graft.functions.Url.canonicalizeUrl(col("uri")).as("src_url"), col("href"))
      .select(col("src_url"),
        graft.functions.Url.canonicalizeUrl(
          graft.functions.Url.resolveUrl(col("src_url"), col("href"))).as("dst_url"))
      .filter(col("dst_url").isNotNull)
    time("full-chain")(full)
  }
}
