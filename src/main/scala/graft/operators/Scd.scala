package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension versioning (SCD type 2): turn a change
  * stream (key, attributes, change time) into interval-versioned
  * dimension rows — one row per (key, version) carrying
  * [valid_from, valid_to) and an is_current flag, with no-op changes
  * (attribute values identical to the key's previous row) collapsed.
  * The warehouse-dimension bookkeeping every as-of consumer
  * ([[AsOf.asofJoin]]) expects on its build side.
  *
  * Scale shape: everything is per-key windows over the key's OWN change
  * rows — one shuffle on the key, partitions sized by a key's change
  * count (dimension keys change rarely; a pathological hot key is a
  * data bug the upstream [[Expectations]] checks catch). The window
  * order is (ts, tieCols…) and must be total per key — pass tie columns
  * whenever change times can collide.
  *
  * Null attribute values: the no-op test compares attribute STRUCTS, so a
  * null field is an ordinary comparable value — null→'x' is a real change
  * and null→null a no-op. A SQL replay must use IS DISTINCT FROM (plain
  * `<>` returns NULL against a null side and silently drops the row).
  */
object Scd {

  def scd2(changes: DataFrame, keyCol: String, tsCol: String,
      attrCols: Seq[String], tieCols: Seq[String] = Nil): DataFrame = {
    val order = (col(tsCol) +: tieCols.map(col)).map(_.asc)
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    val attrs = struct(attrCols.map(col): _*)
    changes
      .withColumn("__prev", lag(attrs, 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= attrs)
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__prev")
  }
}
