package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScdSpec extends SparkSpec {
  import spark.implicits._

  // key 1: a→a (no-op) →b→a; key 2: single change
  private val changes = Seq(
    (1L, 10L, "a"), (1L, 20L, "a"), (1L, 30L, "b"), (1L, 40L, "a"),
    (2L, 15L, "x"))
    .toDF("k", "ts", "attr")

  test("no-op changes collapse; intervals chain; last row is current") {
    val v = Scd.scd2(changes, "k", "ts", attrCols = Seq("attr"))
      .select("k", "ts", "attr", "valid_to", "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), Option(r.get(3)).map(_.asInstanceOf[Long]),
          r.getBoolean(4)))).toMap
    // the ts=20 no-op row is gone
    assert(!v.contains((1L, 20L)))
    assert(v((1L, 10L)) === (("a", Some(30L), false)))
    assert(v((1L, 30L)) === (("b", Some(40L), false)))
    assert(v((1L, 40L)) === (("a", None, true)))
    assert(v((2L, 15L)) === (("x", None, true)))
  }

  test("tie columns make same-ts changes deterministic") {
    val tied = Seq((1L, 10L, 1L, "a"), (1L, 10L, 2L, "b"))
      .toDF("k", "ts", "tie", "attr")
    val v = Scd.scd2(tied, "k", "ts", Seq("attr"), tieCols = Seq("tie"))
      .orderBy("tie").collect()
    assert(v.map(_.getAs[String]("attr")).toSeq === Seq("a", "b"))
    assert(v.head.getAs[Boolean]("is_current") === false)
    assert(v.last.getAs[Boolean]("is_current") === true)
  }

  test("multi-attribute change detection uses the whole struct") {
    val multi = Seq((1L, 10L, "a", 1), (1L, 20L, "a", 2), (1L, 30L, "a", 2))
      .toDF("k", "ts", "s", "n")
    val v = Scd.scd2(multi, "k", "ts", attrCols = Seq("s", "n"))
    assert(v.count() === 2) // the (a,2)→(a,2) repeat collapses; (a,1)→(a,2) doesn't
  }
}
