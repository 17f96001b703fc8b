package graft.operators

import graft.SparkSpec

class SpanCutsSpec extends SparkSpec {
  import spark.implicits._

  // docs 1 and 2 share a 10-token boilerplate prefix; doc 3 repeats its own
  // 4-gram internally; doc 4 is all-unique
  private val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private val docs = Seq(
    (1L, s"$shared one two three four five six seven"),
    (2L, s"$shared uno dos tres cuatro cinco seis siete"),
    (3L, "p q r s p q r s p q r s junk filler words here"),
    (4L, "every token here appears exactly once in the corpus text stream"))
    .toDF("doc_id", "text")

  test("cross-document boilerplate becomes one maximal run per doc") {
    val cuts = Curation.duplicatedSpanCuts(docs, "text", "doc_id",
        n = 4, minOccurrences = 2, minSpanTokens = 8)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("start_pos"), r.getAs[Long]("end_pos"),
          r.getAs[Long]("span_tokens"))).toMap
    // the 10 shared tokens = positions 1..10 in both docs (grams 1..7,
    // last gram start 7 covers tokens 7..10)
    assert(cuts(1L) === ((1L, 10L, 10L)))
    assert(cuts(2L) === ((1L, 10L, 10L)))
    assert(!cuts.contains(4L))
  }

  test("within-document repetition counts as duplication") {
    val cuts = Curation.duplicatedSpanCuts(docs, "text", "doc_id",
        n = 4, minOccurrences = 2, minSpanTokens = 8)
      .filter("doc_id = 3").collect()
    // 'p q r s' ×3: gram positions 1..9 are all repeats of each other
    // ('q r s p' at 2 == at 6, etc.) → one run covering tokens 1..12
    assert(cuts.length === 1)
    assert(cuts.head.getAs[Long]("start_pos") === 1L)
    assert(cuts.head.getAs[Long]("end_pos") === 12L)
  }

  test("runs shorter than minSpanTokens are dropped") {
    val cuts = Curation.duplicatedSpanCuts(docs, "text", "doc_id",
      n = 4, minOccurrences = 2, minSpanTokens = 11)
    assert(cuts.count() === 1) // only doc 3's 12-token run survives
  }

  test("applySpanCuts removes exactly the cut tokens, pass-through otherwise") {
    val cuts = Curation.duplicatedSpanCuts(docs, "text", "doc_id",
      n = 4, minOccurrences = 2, minSpanTokens = 8)
    val out = Curation.applySpanCuts(docs, "text", "doc_id", cuts)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("clean_text"), r.getAs[Long]("n_tokens_before"),
          r.getAs[Long]("n_tokens_after"))).toMap
    assert(out(1L) === (("one two three four five six seven", 17L, 7L)))
    assert(out(2L) === (("uno dos tres cuatro cinco seis siete", 17L, 7L)))
    assert(out(3L) === (("junk filler words here", 16L, 4L)))
    // uncut doc passes through (lower/trim-normalized tokens, all kept)
    assert(out(4L)._2 === out(4L)._3)
    assert(out(4L)._1.startsWith("every token here"))
  }
}
