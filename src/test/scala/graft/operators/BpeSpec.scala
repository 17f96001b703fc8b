package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("learnMerges reproduces the canonical Sennrich example") {
    // the corpus from the paper's running example: low/lower/newest/widest
    // with frequencies 5/2/6/3 — "es" (from newest+widest, freq 9) must be
    // the first merge, then "est", then "est</w>"
    val docs = Seq(
      (1L, (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")))
      .toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, "text", nMerges = 3)
    assert(merges.map(m => (m.left, m.right)) ===
      Seq(("e", "s"), ("es", "t"), ("est", Bpe.EndOfWord)))
  }

  test("segment replays merges in order; round-trip preserves characters") {
    val docs = Seq((1L, "lowest newest low")).toDF("doc_id", "text")
    val train = Seq(
      (2L, (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")))
      .toDF("doc_id", "text")
    val merges = Bpe.learnMerges(train, "text", nMerges = 3)
    val toks = Bpe.segment(docs, "text", "doc_id", merges)
      .select("tokens").as[Seq[String]].head()
    // "est</w>" is a learned unit; unseen words still segment (to chars)
    assert(toks.contains("est</w>"))
    // lossless: joining tokens and stripping markers re-yields the words
    val rebuilt = toks.mkString("").replace(Bpe.EndOfWord, " ").trim
    assert(rebuilt === "lowest newest low")
  }

  test("learnMergesCached: memo on (id, content); regenerated data refits") {
    val docsA = Seq((1L, "aa aa aa bb")).toDF("doc_id", "text")
    val docsB = Seq((1L, "cc cc cc dd")).toDF("doc_id", "text")
    val id = s"bpe-memo-${System.nanoTime()}"
    val first = Bpe.learnMergesCached(docsA, "text", 3, corpusId = id)
    // same id + same content: the memo answers (same object)
    val again = Bpe.learnMergesCached(docsA, "text", 3, corpusId = id)
    assert(again eq first)
    // same id but REGENERATED content: the fingerprint misses and the
    // table refits — a stale merge table can never be served silently
    val refit = Bpe.learnMergesCached(docsB, "text", 3, corpusId = id)
    assert(refit.map(m => (m.left, m.right)) !=
      first.map(m => (m.left, m.right)))
  }

  test("vocabulary equals the per-occurrence histogram of segment()") {
    val docs = Seq(
      (1L, "the quick brown fox and the lazy dog and the quick dog"),
      (2L, "the brown dog and the quick fox ran over the lazy fox"))
      .toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, "text", nMerges = 5)
    val viaVocab = Bpe.vocabulary(docs, "text", merges)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val viaSegment = Bpe.segment(docs, "text", "doc_id", merges)
      .select(explode(col("tokens")).as("unit"))
      .groupBy("unit").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(viaVocab === viaSegment)
  }

  test("corpus-level: merges are distinct, token count shrinks monotonically") {
    val docs = Seq(
      (1L, "the quick brown fox and the lazy dog and the quick dog"),
      (2L, "the brown dog and the quick fox ran over the lazy fox"))
      .toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, "text", nMerges = 8)
    assert(merges.nonEmpty && merges.size <= 8)
    assert(merges.map(m => (m.left, m.right)).distinct.size === merges.size)

    // token totals must strictly shrink as each prefix of merges applies
    // (every learned merge has count >= 2 somewhere in the corpus)
    val totals = (0 to merges.size).map { k =>
      Bpe.segment(docs, "text", "doc_id", merges.take(k))
        .select(sum(size(col("tokens")))).as[Long].head()
    }
    totals.sliding(2).foreach { case Seq(prev, next) =>
      assert(next < prev, s"merge did not shrink tokens: $totals")
    }
  }
}
