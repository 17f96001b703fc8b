package graft.tools

import graft.functions.PosTag
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Diagnostics main: the POS long-tail divergence report. Tokenizes the
  * documents corpus (the same lower/strip/split normalization the text_*
  * queries use), attributes every vocabulary word to the rule that tagged
  * it, and prints the suffix-rule firings in descending corpus frequency
  * — the review surface for growing [[PosTag.nounExceptions]]/
  * [[PosTag.adjExceptions]]: a frequent word on this list tagged by a
  * SUFFIX rule (not the lexicon) is exactly where a collision would hide.
  * usage: PosReport <sfDir> [topN]
  */
object PosReport {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val topN = if (args.length > 1) args(1).toInt else 400
    val spark = graft.GraftSession.get("local[16]", shufflePartitions = 16)
    val vocab = Tables.load(spark, sfDir, "documents")
      .select(explode(split(regexp_replace(lower(col("text")),
        "[^a-z\\- ]", " "), " +")).as("w"))
      .filter(length(col("w")) > 1)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc)
      .collect()
    // attribution comes from PosTag.ruleOf — the SAME cascade the tagger
    // runs (PosTagSpec pins ruleOf == tagOf), so this report can never
    // drift from the rules it audits
    var shown = 0
    vocab.iterator.takeWhile(_ => shown < topN).foreach { r =>
      val (w, f) = (r.getString(0), r.getLong(1))
      val (ru, tg) = PosTag.ruleOf(w)
      if (ru.startsWith("sfx:")) {
        println(f"$f%7d  $w%-24s $tg%-5s $ru")
        shown += 1
      }
    }
    spark.stop()
  }
}
