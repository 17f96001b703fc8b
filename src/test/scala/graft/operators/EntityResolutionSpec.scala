package graft.operators

import graft.SparkSpec
import graft.functions.PartialRatio
import org.apache.spark.sql.functions._

class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  private val recs = Seq(
    (1L, "natural history museum london"),
    (2L, "natural history museum, london"),   // same block, near-identical
    (3L, "natural history department of zoology"), // same block, poor match
    (4L, "history museum natural london"),    // good match, DIFFERENT block
    (5L, "science museum kensington"))
    .toDF("rec_id", "name")

  private def pairs(threshold: Int) =
    EntityResolution.blockedFuzzyPairs(recs, "rec_id", "name",
        substring_index(col("name"), " ", 2), threshold)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Int]("score")).toMap

  test("within-block fuzzy matches pass, poor matches are filtered") {
    val p = pairs(80)
    assert(p.contains((1L, 2L)))
    assert(p((1L, 2L)) >= 90) // the inserted comma costs 2 edits over 29 chars
    assert(!p.contains((1L, 3L)) && !p.contains((2L, 3L)))
  }

  test("blocking bounds the candidate space: cross-block pairs never score") {
    // record 4 is a token permutation of record 1 — partial_ratio would
    // gate it in, but its blocking key differs, so it is never a
    // candidate: the deliberate blocking recall tradeoff (a second pass
    // on another key would union it in)
    assert(PartialRatio.compute("natural history museum london",
      "history museum natural london") < 80) // and even scored, it's poor
    val p = pairs(0)
    assert(p.keySet === Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("scores equal the expression's own partial_ratio") {
    val p = pairs(0)
    assert(p((1L, 2L)) === PartialRatio.compute(
      "natural history museum london", "natural history museum, london"))
    assert(p((1L, 3L)) === PartialRatio.compute(
      "natural history museum london", "natural history department of zoology"))
  }
}
