package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Journal-ranking analytics parity (J9/F17/F18/U2/A5/A8/P8/O2;
  * /root/reference/notebooks/journal-analysis.ipynb).
  *
  * The notebook: count outputs per journal ISSN (cell 2), normalize/explode
  * print+electronic ISSNs (cells 4,10), left-join Scopus CiteScore and SJR
  * ranking tables on ISSN (cells 8,12), repair comma-decimals in SJR (cell
  * 10), profile journals missing from both rankings (cell 14), and append a
  * 'Total' facet row (cell 16). All joins key on the dash-stripped ISSN.
  */
object Journals {

  /** F17: split a multi-ISSN cell, strip dashes, explode — one row per
    * normalized ISSN (cells 2,4,10).
    */
  def explodeIssns(df: DataFrame, issnCol: String): DataFrame =
    df.withColumn("issn",
        explode(split(col(issnCol), "[,;]\\s*")))
      .withColumn("issn", regexp_replace(trim(col("issn")), "-", ""))
      .filter(col("issn") =!= "")

  /** F18: decimal-comma repair — `'1,234'` → 1.234 (SJR CSV, cell 10). */
  def repairDecimalComma(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(c, ",", ".").cast("double")

  /** A5: outputs per ISSN (cell 2's journal counts). */
  def journalCounts(outputs: DataFrame, issnCol: String): DataFrame =
    explodeIssns(outputs, issnCol)
      .groupBy(col("issn")).agg(count(lit(1)).as("n_outputs"))

  /** Deterministic one-row-per-ISSN keeper: row_number over an explicit
    * ordering instead of `dropDuplicates`, whose survivor is plan-dependent
    * (partitioning order) and therefore not oracle-reproducible.
    */
  private def keepFirstPerIssn(df: DataFrame, order: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("issn")).orderBy(order: _*)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** J9: counts ⟕ Scopus (CiteScore) ⟕ SJR on normalized ISSN (cell 12).
    * The reference dedupes AFTER the join with an arbitrary-survivor
    * `drop_duplicates`; here each ranking side is deduped BEFORE the join
    * with a deterministic first-by-sort keeper — same row count and key set,
    * but reproducible across engines and plan changes.
    */
  def rankedJournals(counts: DataFrame, scopus: DataFrame, sjr: DataFrame): DataFrame =
    counts
      .join(keepFirstPerIssn(
        explodeIssns(scopus, "issns")
          .select(col("issn"), col("title").as("scopus_title"), col("citescore")),
        Seq(col("scopus_title"), col("citescore"))), Seq("issn"), "left")
      .join(keepFirstPerIssn(
        explodeIssns(sjr, "issns")
          .select(col("issn"), repairDecimalComma(col("sjr")).as("sjr"),
            col("h_index").cast("int").as("h_index")),
        Seq(col("sjr"), col("h_index"))), Seq("issn"), "left")

  /** P8 + O2 (cell 14): journals absent from every ranking, by output count. */
  def missingFromRankings(ranked: DataFrame): DataFrame =
    ranked
      .filter(col("citescore").isNull && col("sjr").isNull && col("h_index").isNull)
      .orderBy(col("n_outputs").desc, col("issn"))

  /** A8 + U2 (cell 16): per-metric coverage with an appended 'Total' row. */
  def coverageWithTotal(ranked: DataFrame): DataFrame = {
    val base = ranked.select(
      when(col("citescore").isNotNull, "CiteScore")
        .when(col("sjr").isNotNull, "SJR")
        .otherwise("Unranked").as("ranking"),
      col("n_outputs"))
    val per = base.groupBy(col("ranking"))
      .agg(sum(col("n_outputs")).as("n_outputs"), count(lit(1)).as("n_journals"))
    val total = base.agg(sum(col("n_outputs")).as("n_outputs"),
      count(lit(1)).as("n_journals")).withColumn("ranking", lit("Total"))
    per.unionByName(total.select("ranking", "n_outputs", "n_journals"))
  }
}
