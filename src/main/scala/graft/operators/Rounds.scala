package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** U1 — the reference's fundamental "4 source databases → 1 frame" move
  * (/root/reference/synth/etl.py:349 and every per-round loop; SURVEY §2.7).
  *
  * In the reference this is a Python loop over `zip(SynthRound, sources)`;
  * here each round is a tagged DataFrame and the union is a single
  * `unionByName` plan node. The `round` tag becomes a partition column on
  * write, so at 100 TB downstream per-round predicates become partition
  * pruning, not scans.
  */
object Rounds {

  /** Tag each frame with its round ordinal and union by name. */
  def tagAndUnion(frames: Seq[DataFrame]): DataFrame =
    frames.zipWithIndex
      .map { case (df, r) => df.withColumn("round", lit(r)) }
      .reduce(_.unionByName(_))

  /** Testdata analog of the 4 source DBs: partition one table into 4
    * disjoint "rounds" by key mod 4, then tag-and-union. The round-trip is
    * deliberately a real 4-way union (not a computed column) so the plan
    * exercises U1's shape.
    */
  def fourWaySplitUnion(df: DataFrame, keyCol: String): DataFrame =
    tagAndUnion((0 until 4).map(r => df.filter(pmod(col(keyCol), lit(4)) === r)))
}
