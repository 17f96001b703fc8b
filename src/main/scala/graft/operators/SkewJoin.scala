package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (builder brief: "salting for skew"; the
  * reference's skew candidate is `home_institution_town` — a handful of
  * cities dominate).
  *
  * AQE's skew-join handling (on in GraftSession) splits oversized
  * partitions at runtime and is the first line of defense. Salting is the
  * plan-level fallback when AQE can't help — e.g. skewed AGGREGATION keys
  * or joins below AQE's thresholds:
  *
  *  - the large (skewed) side gets a deterministic salt derived from a
  *    secondary column's hash — same rows always land in the same salted
  *    partition (reproducible, no RNG state);
  *  - the small side is exploded `saltFactor`× so every salted key finds
  *    its match;
  *  - the join key becomes (key, salt): hot keys fan out over saltFactor
  *    partitions instead of one straggler task.
  */
object SkewJoin {

  def saltedJoin(
      large: DataFrame, small: DataFrame, key: String,
      saltFactor: Int, saltBy: String): DataFrame = {
    val salted = large.withColumn("__salt",
      pmod(xxhash64(col(saltBy)), lit(saltFactor)).cast("int"))
    val exploded = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(exploded, Seq(key, "__salt")).drop("__salt")
  }
}
