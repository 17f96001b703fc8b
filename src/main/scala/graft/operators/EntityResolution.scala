package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy record linkage — the production shape of the reference's
  * fuzzy acceptance gates (synth/resources.py:278-296 gates HTTP search
  * candidates with `fuzz.partial_ratio >= 80`; J6's institution-alias
  * cleaning is the same match problem): find record pairs whose string
  * keys fuzzy-match above a threshold WITHOUT scoring all pairs.
  *
  * Classic ER blocking (Fellegi–Sunter shape): a cheap deterministic
  * blocking key prunes the candidate space to within-block pairs — an
  * equi-join Spark shuffles once on the key — and only candidates pay the
  * O(|s|·|l|) windowed-Levenshtein [[graft.functions.PartialRatio]]
  * (native codegen'd expression, never a UDF). At 100 TB the block key is
  * the unit of parallelism: blocks are independent, skewed mega-blocks
  * can salt like any hot join key, and a second blocking pass (different
  * key) unions in recall the first key missed — each pass stays
  * all-pairs-free.
  */
object EntityResolution {

  /** Self-join form: all (id_a < id_b) pairs sharing `blockExpr` whose
    * `nameCol` partial-ratio clears `threshold`. `blockExpr` is evaluated
    * against the projected (id, name) record, so callers can block on any
    * derivation of the name (first tokens, phonetic key, length band, …).
    */
  def blockedFuzzyPairs(records: DataFrame, idCol: String, nameCol: String,
      blockExpr: Column, threshold: Int): DataFrame = {
    val keyed = records
      .select(col(idCol).as("id"), col(nameCol).as("name"))
      .withColumn("block", blockExpr)
    val a = keyed.select(col("block"), col("id").as("id_a"),
      col("name").as("name_a"))
    val b = keyed.select(col("block"), col("id").as("id_b"),
      col("name").as("name_b"))
    // one block value per record ⇒ each pair is produced at most once —
    // no dedup aggregation needed (a multi-pass blocking scheme that
    // unions several keys would dedup across passes instead)
    a.join(b, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.functions.Fuzzy.partialRatio(col("name_a"), col("name_b"))
          .as("score"))
      .filter(col("score") >= threshold)
  }
}
