package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // quotes: (key, ts, px); trades: (key, ts, trade_id)
  private lazy val quotes = Seq(
    ("A", ts("2024-01-01 10:00:00"), 1.0),
    ("A", ts("2024-01-01 10:00:05"), 2.0),
    ("A", ts("2024-01-01 10:00:20"), 3.0),
    ("B", ts("2024-01-01 10:00:03"), 9.0)
  ).toDF("sym", "q_ts", "px")

  private lazy val trades = Seq(
    ("A", ts("2024-01-01 09:59:59"), 100L), // before any quote
    ("A", ts("2024-01-01 10:00:05"), 101L), // equal ts -> matches that quote
    ("A", ts("2024-01-01 10:00:07"), 102L), // between quotes
    ("A", ts("2024-01-01 10:01:00"), 103L), // long after last quote
    ("B", ts("2024-01-01 10:00:10"), 104L),
    ("C", ts("2024-01-01 10:00:00"), 105L)  // key with no quotes at all
  ).toDF("sym", "t_ts", "trade_id")

  private def run(direction: String, tolerance: Option[Long] = None) =
    AsOf.asofJoin(trades, quotes, key = "sym", leftTs = "t_ts", rightTs = "q_ts",
        direction = direction, tolerance = tolerance)
      .select("trade_id", "px")
      .as[(Long, Option[Double])].collect().toMap

  test("backward: most recent quote at-or-before each trade") {
    assert(run("backward") === Map(
      100L -> None,        // no quote yet
      101L -> Some(2.0),   // equal timestamp matches
      102L -> Some(2.0),
      103L -> Some(3.0),
      104L -> Some(9.0),
      105L -> None))       // key never quoted
  }

  test("forward: earliest quote at-or-after each trade") {
    assert(run("forward") === Map(
      100L -> Some(1.0),
      101L -> Some(2.0),   // equal timestamp matches in forward too
      102L -> Some(3.0),
      103L -> None,        // nothing after
      104L -> None,
      105L -> None))
  }

  test("tolerance nulls out matches farther than the bound") {
    // 10-second tolerance: trade 103 is 40s after quote 3 -> dropped
    assert(run("backward", tolerance = Some(10L * 1000000L)) === Map(
      100L -> None, 101L -> Some(2.0), 102L -> Some(2.0),
      103L -> None, 104L -> Some(9.0), 105L -> None))
  }

  test("left row count and columns are preserved") {
    val out = AsOf.asofJoin(trades, quotes, "sym", "t_ts", "q_ts")
    assert(out.count() === trades.count())
    assert(out.columns.toSeq === Seq("sym", "t_ts", "trade_id", "q_ts", "px"))
  }

  test("non-key column overlap is rejected") {
    intercept[IllegalArgumentException] {
      AsOf.asofJoin(trades, trades.withColumnRenamed("t_ts", "q_ts"),
        "sym", "t_ts", "q_ts")
    }
  }

  test("tolerance form equals the state-bounded streaming formulation (interval join + max_by)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(11)
    def stamp(sec: Int) = new Timestamp(sec * 1000L)
    // events shaped like the testdata: views (right) unique per (user, ts)
    val viewRows = (1 to 200).map(i => (1L + rnd.nextInt(6), rnd.nextInt(3600)))
      .distinct.zipWithIndex.map { case ((u, s), i) => (u, s, 5000L + i) }
    val purchRows = (1 to 150).map(i => (1L + rnd.nextInt(6), rnd.nextInt(3600), i.toLong))
    val views = viewRows.map { case (u, s, id) => (u, stamp(s), id) }
      .toDF("user_id", "view_ts", "view_id")
    val purchases = purchRows.map { case (u, s, id) => (u, stamp(s), id) }
      .toDF("p_user_id", "purchase_ts", "purchase_id")

    val windowMinutes = 30
    // batch as-of with tolerance = the window
    val asof = AsOf.asofJoin(
        purchases.withColumnRenamed("p_user_id", "user_id"),
        views, "user_id", "purchase_ts", "view_ts",
        tolerance = Some(windowMinutes * 60L * 1000000L))
      .select("purchase_id", "view_id")
      .as[(Long, Option[Long])].collect().toMap

    // the streaming-legal form: watermarked interval join (state bounded
    // by the interval) + latest-view-per-purchase — runs unchanged on
    // readStream sources (EventStreamsSpec drives the interval join there)
    val interval = graft.streaming.EventStreams.viewPurchaseAttribution(
      views.select(col("user_id"), col("view_ts").as("ts"), col("view_id").as("event_id")),
      purchases.select(col("p_user_id").as("user_id"), col("purchase_ts").as("ts"),
        col("purchase_id").as("event_id"), lit(0.0).as("value")),
      windowMinutes)
    val streaming = interval.groupBy(col("purchase_id"))
      .agg(max_by(col("view_id"), struct(col("view_ts"), col("view_id"))).as("view_id"))
      .as[(Long, Long)].collect().toMap

    // matched purchases agree exactly; asof's null rows are exactly the
    // purchases the inner interval join drops
    assert(asof.collect { case (p, Some(v)) => p -> v } === streaming)
    assert(asof.filter(_._2.isEmpty).keySet ===
      purchRows.map(_._3).toSet -- streaming.keySet)
  }

  test("randomized: agrees with a linear-scan reference on both directions + tolerance") {
    import spark.implicits._
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new scala.util.Random(seed)
      val keys = Vector("a", "b", "c", "d")
      def stamp(sec: Int) = new Timestamp(sec * 1000L)
      // unique (key, ts) on the right side (the operator's documented precondition)
      val rRows = (1 to 150).map(i =>
          (keys(rnd.nextInt(keys.size)), rnd.nextInt(2000)))
        .distinct.zipWithIndex
        .map { case ((k, sec), i) => (k, sec, 1000L + i) }
      val lRows = (1 to 120).map(i =>
        (keys(rnd.nextInt(keys.size)), rnd.nextInt(2000), i.toLong))
      val right = rRows.map { case (k, s, id) => (k, stamp(s), id) }
        .toDF("sym", "q_ts", "quote_id")
      val left = lRows.map { case (k, s, id) => (k, stamp(s), id) }
        .toDF("sym", "t_ts", "trade_id")

      def reference(direction: String, tolSec: Option[Int]): Map[Long, Option[Long]] =
        lRows.map { case (k, ts, id) =>
          val cands = rRows.filter(r => r._1 == k &&
            (if (direction == "backward") r._2 <= ts else r._2 >= ts) &&
            tolSec.forall(t => math.abs(r._2 - ts) <= t))
          val best =
            if (cands.isEmpty) None
            else if (direction == "backward") Some(cands.maxBy(_._2)._3)
            else Some(cands.minBy(_._2)._3)
          id -> best
        }.toMap

      for ((dir, tol) <- Seq(("backward", None), ("forward", None),
                             ("backward", Some(100)), ("forward", Some(100)))) {
        val got = AsOf.asofJoin(left, right, "sym", "t_ts", "q_ts",
            direction = dir, tolerance = tol.map(_ * 1000000L))
          .select("trade_id", "quote_id")
          .as[(Long, Option[Long])].collect().toMap
        assert(got === reference(dir, tol), s"seed=$seed dir=$dir tol=$tol")
      }
    }
  }
}
