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
    def rule(t: String): String = {
      if (PosTag.det.contains(t) || PosTag.conj.contains(t) ||
        PosTag.pron.contains(t) || PosTag.adp.contains(t) ||
        PosTag.aux.contains(t) || PosTag.advLex.contains(t) ||
        PosTag.num.contains(t)) "closed-lex"
      else if (PosTag.nounExceptions.contains(t) ||
        PosTag.adjExceptions.contains(t)) "exception-lex"
      else if (t.matches("^[0-9]+([.][0-9]+)?$")) "numeric"
      else if (t.endsWith("ly")) "sfx:-ly"
      else PosTag.nounSuffixes.find(t.endsWith).map("sfx:-" + _)
        .orElse(PosTag.adjSuffixes.find(t.endsWith).map("sfx:-" + _))
        .orElse(PosTag.verbSuffixes.find(t.endsWith).map("sfx:-" + _))
        .getOrElse(
          if (t.endsWith("ing") && t.length > 5) "sfx:-ing"
          else if (t.endsWith("ed") && t.length > 4) "sfx:-ed"
          else "default-NOUN")
    }
    var shown = 0
    vocab.iterator.takeWhile(_ => shown < topN).foreach { r =>
      val (w, f) = (r.getString(0), r.getLong(1))
      val ru = rule(w)
      if (ru.startsWith("sfx:")) {
        println(f"$f%7d  $w%-24s ${PosTag.tagOf(w)}%-5s $ru")
        shown += 1
      }
    }
    spark.stop()
  }
}
