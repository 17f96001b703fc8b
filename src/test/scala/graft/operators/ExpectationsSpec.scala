package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._
  import Expectations._

  test("each check counts its violations exactly on a dirty fixture") {
    val dirty = Seq(
      (Some(1L), Some(10.0), 1),   // clean
      (Some(1L), Some(10.0), 1),   // duplicate of row 1 (unique violation)
      (None, Some(5.0), 2),        // null key (not_null + fk skips nulls)
      (Some(2L), None, 3),         // null quantity (in_range violation)
      (Some(3L), Some(99.0), 4),   // out of range
      (Some(7L), Some(20.0), 5))   // orphan key (not in dim)
      .toDF("k", "q", "line")
    val dim = Seq(1L, 2L, 3L).toDF("pk")

    val rep = report(dirty, Seq(
      NotNull("k"),
      InRange("q", 1.0, 50.0),
      Unique(Seq("k", "line")),
      FkIn("k", dim, "pk"),
      RowCountBetween(10, 100))) // 6 rows -> fails
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(3), r.getBoolean(4))).toMap

    assert(rep(("not_null", "k")) === ((1L, false)))
    assert(rep(("in_range[1.0,50.0]", "q")) === ((2L, false))) // null + 99.0
    assert(rep(("unique", "k,line")) === ((1L, false)))        // one extra copy
    assert(rep(("fk_in[pk]", "k")) === ((1L, false)))          // only key 7
    assert(rep(("row_count[10,100]", "*")) === ((1L, false)))
    assert(rep.values.forall(!_._2))

    // a clean table passes everything
    val clean = Seq((Some(1L), Some(10.0), 1), (Some(2L), Some(20.0), 1))
      .toDF("k", "q", "line")
    val ok = report(clean, Seq(
      NotNull("k"), InRange("q", 1.0, 50.0), Unique(Seq("k", "line")),
      FkIn("k", dim, "pk"), RowCountBetween(1, 100)))
    assert(ok.filter(!col("pass")).count() === 0)
  }
}
