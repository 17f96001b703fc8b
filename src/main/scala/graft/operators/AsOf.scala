package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.DataFrame

/** As-of (nearest-event) join — attach to each left row the most recent
  * right row with the same key at-or-before its timestamp ("backward",
  * the pandas `merge_asof` default), or the earliest at-or-after
  * ("forward"). The reference has no as-of join (all its joins are
  * equi-joins — SURVEY §2.3); this is a beyond-reference operator from
  * the builder brief, built by COMPOSITION rather than a custom physical
  * operator:
  *
  *   tag both sides → unionByName → one window over (key) ordered by
  *   (ts, side) → `last(right_struct, ignoreNulls)` carries the latest
  *   right row forward onto each left row.
  *
  * Why composition wins here: the naive formulation — range join on
  * `l.ts >= r.ts` + max_by — plans as a broadcast-nested-loop over every
  * (key-match, ts-pair) and degenerates to O(|L|·|R|) per key. The union
  * form costs exactly ONE hash-partition shuffle of L+R on the key plus a
  * per-partition sort — the same physical work as a sort-merge join, and
  * it stays that shape at any scale. Window skew mirrors join skew: a
  * hot key serializes through one task, so salt the key upstream if one
  * key dominates (operators/SkewJoin.scala has the pattern).
  *
  * Streaming: with a tolerance this is expressible state-bounded as a
  * watermarked interval join ([[graft.streaming.EventStreams.viewPurchaseAttribution]])
  * + `max_by` per left row; without a tolerance the "most recent right
  * ever" state is unbounded and has no streaming analog.
  *
  * Preconditions: `left`/`right` column names must be disjoint apart from
  * `key` (alias upstream), and right rows unique per (key, ts) — at equal
  * (key, ts) the carried winner is otherwise tie-broken only by input
  * order. Dedupe with e.g. `groupBy(key, ts).agg(max_by(...))` first.
  */
object AsOf {

  /** @param tolerance max |left.ts − right.ts| in microseconds; matches
    *                  farther away are nulled out (pandas merge_asof
    *                  `tolerance`). None = unbounded lookback/lookahead.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val overlap = (left.columns.toSet & right.columns.toSet) - key
    require(overlap.isEmpty, s"non-key column overlap: $overlap — alias upstream")

    val lType = StructType(left.schema.fields)
    val rType = StructType(right.schema.fields)
    // At equal ts the right row must fall INSIDE the left row's window
    // frame: before it for backward (frame ends at currentRow), after it
    // for forward (frame starts at currentRow).
    val (rightTag, leftTag) = if (direction == "backward") (0, 1) else (1, 0)

    val lSide = left.select(
      col(key).as("__k"), col(leftTs).as("__ts"), lit(leftTag).as("__side"),
      struct(left.columns.map(col): _*).as("__l"),
      lit(null).cast(rType).as("__r"))
    val rSide = right.select(
      col(key).as("__k"), col(rightTs).as("__ts"), lit(rightTag).as("__side"),
      lit(null).cast(lType).as("__l"),
      struct(right.columns.map(col): _*).as("__r"))

    val w = Window.partitionBy(col("__k")).orderBy(col("__ts"), col("__side"))
    val carried =
      if (direction == "backward")
        last(col("__r"), ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      else
        first(col("__r"), ignoreNulls = true)
          .over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing))

    val withMatch = lSide.unionByName(rSide)
      .withColumn("__m", carried)
      .filter(col("__side") === leftTag)
    val gated = tolerance match {
      case Some(tol) =>
        val gap = abs(unix_micros(col("__l")(leftTs)) - unix_micros(col("__m")(rightTs)))
        withMatch.withColumn("__m", when(col("__m").isNotNull && gap <= tol, col("__m")))
      case None => withMatch
    }
    val leftCols  = left.columns.map(c => col("__l")(c).as(c))
    val rightCols = right.columns.filterNot(_ == key).map(c => col("__m")(c).as(c))
    gated.select(leftCols ++ rightCols: _*)
  }
}
