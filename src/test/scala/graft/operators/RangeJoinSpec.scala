package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val points = Seq(
    (1L, "a", 5L), (2L, "a", 15L), (3L, "a", 25L), (4L, "b", 15L),
    (5L, "a", 100L))
    .toDF("pid", "k", "p")

  private val intervals = Seq(
    (10L, "a", 0L, 20L),    // spans 3 bins at width 10; catches points 1, 2
    (11L, "a", 14L, 16L),   // sub-bin interval; catches point 2
    (12L, "b", 10L, 20L),   // other key; catches point 4 only
    (13L, "a", 30L, 40L))   // catches nothing
    .toDF("iid", "k", "s", "e")

  private def naive(keys: Boolean) = {
    val cond = if (keys) points("k") === intervals("k") else lit(true)
    points.join(intervals, cond && points("p") >= intervals("s")
        && points("p") <= intervals("e"))
      .select(points("pid"), intervals("iid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("keyed binned join equals the naive BETWEEN join, each match once") {
    val got = RangeJoin.binnedRangeJoin(points, intervals, "p", "s", "e",
        binWidth = 10L, keys = Seq("k"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length === got.toSet.size) // multi-bin intervals: no dups
    assert(got.toSet === naive(keys = true))
    assert(got.toSet === Set((1L, 10L), (2L, 10L), (2L, 11L), (4L, 12L)))
  }

  test("keyless binned join equals the naive cross-range join") {
    val got = RangeJoin.binnedRangeJoin(points, intervals.drop("k"),
        "p", "s", "e", binWidth = 10L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length === got.toSet.size)
    assert(got.toSet === naive(keys = false))
  }

  test("boundary inclusivity: both interval endpoints match") {
    val pts = Seq((1L, 10L), (2L, 20L), (3L, 21L)).toDF("pid", "p")
    val iv = Seq((9L, 10L, 20L)).toDF("iid", "s", "e")
    val got = RangeJoin.binnedRangeJoin(pts, iv, "p", "s", "e", binWidth = 7L)
      .select("pid").collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 2L))
  }

  test("seeded random data: binned equals naive at several bin widths") {
    val rnd = new scala.util.Random(42)
    val pts = (1L to 200L).map(i =>
      (i, if (rnd.nextBoolean()) "a" else "b", rnd.nextLong(5000L)))
      .toDF("pid", "k", "p")
    val ivs = (1L to 60L).map { i =>
      val s = rnd.nextLong(5000L)
      (i, if (rnd.nextBoolean()) "a" else "b", s, s + rnd.nextLong(400L))
    }.toDF("iid", "k", "s", "e")
    val expected = pts.join(ivs, pts("k") === ivs("k")
        && pts("p") >= ivs("s") && pts("p") <= ivs("e"))
      .select(pts("pid"), ivs("iid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty) // the comparison must not be vacuous
    for (w <- Seq(1L, 7L, 100L, 10000L)) {
      val got = RangeJoin.binnedRangeJoin(pts, ivs, "p", "s", "e",
          binWidth = w, keys = Seq("k"))
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length === got.toSet.size, s"dup matches at width $w")
      assert(got.toSet === expected, s"mismatch at width $w")
    }
  }

  test("the binned plan is an equi-join, not a nested loop") {
    val binned = RangeJoin.binnedRangeJoin(points, intervals, "p", "s", "e",
      binWidth = 10L, keys = Seq("k"))
    val plan = binned.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin")
      && !plan.contains("CartesianProduct"), plan)
    // the naive keyless form IS a nested loop — the thing binning removes
    val naivePlan = points.join(intervals.drop("k"),
        points("p") >= intervals("s") && points("p") <= intervals("e"))
      .queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin"), naivePlan)
  }
}
