package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (the Deequ shape — Schelter et
  * al. 2018, "Automating Large-Scale Data Quality Verification"): a
  * checklist a 100 TB ingestion runs BEFORE publishing a snapshot, so a
  * upstream schema drift or a bad extract fails the build instead of
  * silently training into the model. Emits one row per check:
  * (check, column, n_rows, violations, pass).
  *
  * Scale shape: every row-local check (not-null, range, regex) folds into
  * ONE aggregation pass over the table — adding checks adds columns to a
  * single `agg`, not passes. The two relational checks run bounded extra
  * passes: uniqueness is one groupBy on the checked key counting groups
  * with >1 row (never an Expand over mixed countDistincts — see the
  * `approx_distinct_users` buffer-explosion audit), and FK containment is
  * a left-anti count against the dimension (broadcast when the dim is
  * small). Nothing collects; the report is itself a tiny DataFrame.
  */
object Expectations {

  sealed trait Check
  /** `col` must never be null. */
  final case class NotNull(column: String) extends Check
  /** `col` must lie in [lo, hi] (nulls count as violations). */
  final case class InRange(column: String, lo: Double, hi: Double) extends Check
  /** The column tuple must be unique across the table. */
  final case class Unique(columns: Seq[String]) extends Check
  /** Every non-null value of `column` must exist in `dimCol` of `dim`. */
  final case class FkIn(column: String, dim: DataFrame, dimCol: String) extends Check
  /** Total row count must lie in [lo, hi]. */
  final case class RowCountBetween(lo: Long, hi: Long) extends Check

  private def label(c: Check): (String, String) = c match {
    case NotNull(col) => ("not_null", col)
    case InRange(col, lo, hi) => (s"in_range[$lo,$hi]", col)
    case Unique(cols) => ("unique", cols.mkString(","))
    case FkIn(col, _, dimCol) => (s"fk_in[$dimCol]", col)
    case RowCountBetween(lo, hi) => (s"row_count[$lo,$hi]", "*")
  }

  /** Evaluate the checks; returns (check, column, n_rows, violations,
    * pass) with one row per check, ordered by (check, column).
    */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    val spark = df.sparkSession

    // one aggregation pass for every row-local check + the row count
    val rowLocal: Seq[(Check, Column)] = checks.collect {
      case c @ NotNull(col) =>
        c -> sum(when(df(col).isNull, 1L).otherwise(0L))
      case c @ InRange(col, lo, hi) =>
        c -> sum(when(df(col).isNull || df(col) < lo || df(col) > hi, 1L)
          .otherwise(0L))
    }
    val aggCols = count(lit(1)).as("__n") +:
      rowLocal.zipWithIndex.map { case ((_, e), i) => e.as(s"__v$i") }
    val base = df.agg(aggCols.head, aggCols.tail: _*).head()
    val nRows = base.getLong(0)

    val rows = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long, Long)]
    rowLocal.zipWithIndex.foreach { case ((c, _), i) =>
      val (name, col) = label(c)
      rows += ((name, col, nRows, base.getLong(i + 1)))
    }
    checks.foreach {
      case c @ Unique(cols) =>
        // rows in oversized groups minus one keeper each = duplicate rows
        val dups = df.groupBy(cols.map(df(_)): _*).count()
          .filter(col("count") > 1)
          .agg(coalesce(sum(col("count") - 1), lit(0L)).as("d"))
          .head().getLong(0)
        val (name, lcol) = label(c)
        rows += ((name, lcol, nRows, dups))
      case c @ FkIn(column, dim, dimCol) =>
        val orphans = df.select(df(column).as("__k")).filter(col("__k").isNotNull)
          .join(broadcast(dim.select(dim(dimCol).as("__k")).distinct()),
            Seq("__k"), "left_anti")
          .count()
        val (name, lcol) = label(c)
        rows += ((name, lcol, nRows, orphans))
      case c @ RowCountBetween(lo, hi) =>
        val (name, lcol) = label(c)
        rows += ((name, lcol, nRows, if (nRows >= lo && nRows <= hi) 0L else 1L))
      case _ => () // row-local, already handled
    }

    import spark.implicits._
    rows.toSeq.toDF("check", "column", "n_rows", "violations")
      .withColumn("pass", col("violations") === 0L)
      .orderBy("check", "column")
  }
}
