package graft.etl

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** FillMissingCountryData (J12; /root/reference/synth/etl.py:674-769):
  * resolve a free-text town to a country code against a geonames-style city
  * table.
  *
  * Resolution precedence (reference order preserved):
  *  1. manual override map (unmatched_home_institutions.json, etl.py:714-715)
  *  2. exact match of lower(trim(town)) against name ∪ alternatenames
  *  3. delimiter fallback — split on `", "`, `" - "`, `". "` IN ORDER and
  *     match the first segment; the first delimiter that yields candidates
  *     wins (etl.py:721-728)
  *  4. ambiguity: all candidates same country → that country; otherwise the
  *     max-population candidate wins (etl.py:731-750 — including its
  *     documented Islamabad-style mismatch, which is semantics, not a bug)
  *
  * Spark shape: the per-town linear scan over ~25k cities (find_cities,
  * etl.py:689-696) becomes one explode of name variants + a broadcast-able
  * equi-join; each fallback stage is another join on the derived key, and
  * precedence is a coalesce over stage results. All stages are
  * O(towns + cities), no driver loops — at 100 TB the towns side streams.
  */
object Geo {

  /** Explode the city table to one row per lowercase name variant. */
  def cityVariants(cities: DataFrame): DataFrame =
    cities.select(
      explode(array_union(array(col("name")),
        col("alternatenames").cast("array<string>"))).as("variant"),
      col("countrycode"), col("population"))
      .select(lower(col("variant")).as("variant"), col("countrycode"), col("population"))

  /** Resolve one town-key column against the variants; returns
    * (key, resolved_code) applying the same-country/max-population rule.
    */
  private def resolveKey(keyed: DataFrame, variants: DataFrame): DataFrame = {
    val cands = keyed.join(variants, keyed("key") === variants("variant"))
    cands.groupBy(col("key"))
      .agg(countDistinct(col("countrycode")).as("n_countries"),
        max_by(col("countrycode"), struct(col("population"), col("countrycode"))).as("biggest"),
        min(col("countrycode")).as("only"))
      .select(col("key"),
        when(col("n_countries") === 1, col("only")).otherwise(col("biggest")).as("code"))
  }

  /** Fill home_institution_country where NULL/empty and a town is present
    * (etl.py:752-769). `manual` maps town (verbatim, pre-trim — matching the
    * reference's `town in manually_mapped`) → country code; `countryMapping`
    * maps code → Country id (J7).
    */
  def fillMissingCountry(
      visitorProject: DataFrame, cities: DataFrame,
      manual: Map[String, String], countryMapping: DataFrame): DataFrame = {

    val variants = cityVariants(cities)

    val needs = visitorProject
      .filter((col("home_institution_country").isNull ||
        col("home_institution_country") === 0) && col("home_institution_town").isNotNull &&
        col("home_institution_town") =!= "")
      .select(col("id").as("vp_id"), col("home_institution_town").as("town"))

    val manualCol = typedLit(manual)
    val withManual = needs
      .withColumn("manual_code", element_at(manualCol, col("town")))

    // stage 2: exact variant match
    val exactKey = withManual.select(col("vp_id"),
      lower(trim(col("town"))).as("key"))
    val exact = resolveKey(
      exactKey.select(col("key")).distinct(), variants)
      .withColumnRenamed("code", "exact_code")

    // stage 3: delimiter fallbacks, in precedence order
    val delims = Seq(", ", " - ", ". ")
    val fallbacks = delims.zipWithIndex.map { case (d, i) =>
      val key = withManual
        .filter(size(split(col("town"), java.util.regex.Pattern.quote(d))) > 1)
        .select(lower(trim(element_at(split(col("town"), java.util.regex.Pattern.quote(d)), 1)))
          .as("key")).distinct()
      resolveKey(key, variants).withColumnRenamed("code", s"fb${i}_code")
    }

    val townKey = lower(trim(col("town")))
    var resolved = withManual
      .join(broadcast(exact), townKey === exact("key"), "left").drop("key")
    delims.zipWithIndex.foreach { case (d, i) =>
      val q = java.util.regex.Pattern.quote(d)
      val fbKey = when(size(split(col("town"), q)) > 1,
        lower(trim(element_at(split(col("town"), q), 1))))
      resolved = resolved.join(broadcast(fallbacks(i)), fbKey === fallbacks(i)("key"), "left")
        .drop("key")
    }

    val code = coalesce(
      col("manual_code"), col("exact_code"),
      col("fb0_code"), col("fb1_code"), col("fb2_code"))

    val updates = resolved
      .withColumn("code", code)
      .join(broadcast(countryMapping.select(col("original_id").as("code"),
        col("new_id").as("resolved_country"))), Seq("code"), "left")
      .select(col("vp_id"), col("resolved_country"))
      .filter(col("resolved_country").isNotNull)

    visitorProject.join(broadcast(updates),
        visitorProject("id") === updates("vp_id"), "left")
      .withColumn("home_institution_country",
        coalesce(
          when(col("home_institution_country") === 0, lit(null)) // falsy-empty
            .otherwise(col("home_institution_country")),
          col("resolved_country")))
      .drop("vp_id", "resolved_country")
  }
}
