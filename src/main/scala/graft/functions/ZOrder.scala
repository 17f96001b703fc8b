package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve keys for write-time multi-dimensional clustering.
  *
  * The 100 TB story: parquet data skipping prunes on per-file min/max
  * statistics, which a single-column sort concentrates on ONE dimension —
  * range filters on any other column scan everything. Sorting the write by
  * the bit-interleaved key of two range-filter columns clusters BOTH: a
  * file of consecutive z-values covers a tile in (a, b) space, so a query
  * box overlaps few files in either dimension (the scheme behind
  * clustering keys in modern lakehouse table formats; curve construction
  * per Morton 1966).
  *
  * Everything here is plain integer Column arithmetic — whole-stage
  * codegen'd, no UDF, and bit-for-bit reproducible by any engine with
  * shifts and masks (the DuckDB oracle replays the identical chain).
  */
object ZOrder {

  private val Mask32 = 4294967295L // 0xFFFFFFFF
  // magic-number bit spread: after the fold, bit i of the 32-bit input
  // sits at position 2i of a 64-bit value
  private val spreadSteps = Seq(
    16 -> 281470681808895L,     // 0x0000FFFF0000FFFF
    8 -> 71777214294589695L,    // 0x00FF00FF00FF00FF
    4 -> 1085102592571150095L,  // 0x0F0F0F0F0F0F0F0F
    2 -> 3689348814741910323L,  // 0x3333333333333333
    1 -> 6148914691236517205L)  // 0x5555555555555555

  /** Spread the low 32 bits of `x`: bit i moves to position 2i. */
  def spreadBits(x: Column): Column =
    spreadSteps.foldLeft(x.cast("bigint").bitwiseAND(lit(Mask32))) {
      case (v, (shift, mask)) =>
        v.bitwiseOR(shiftleft(v, shift)).bitwiseAND(lit(mask))
    }

  /** The Morton key of (a, b): a's bits at even positions, b's at odd.
    * Inputs are masked to their low 32 bits — quantize or bucketize
    * wider/continuous dimensions first (e.g. `floor(price)`); monotone
    * quantization preserves the locality the curve exists for.
    */
  def interleave(a: Column, b: Column): Column =
    spreadBits(a).bitwiseOR(shiftleft(spreadBits(b), 1))

  // the spread chain run backwards: un-shift by 1,2,4,8,16, each step
  // masked by the PREVIOUS spread step's mask, landing on the 32-bit value
  private val compactSteps = Seq(
    1 -> 3689348814741910323L,
    2 -> 1085102592571150095L,
    4 -> 71777214294589695L,
    8 -> 281470681808895L,
    16 -> Mask32)

  /** Collapse every second bit (positions 2i) of `z` back to a 32-bit
    * value — the inverse of [[spreadBits]], for round-trip checks and for
    * recovering tile coordinates from a key range.
    */
  def compactBits(z: Column): Column =
    compactSteps.foldLeft(
        z.cast("bigint").bitwiseAND(lit(6148914691236517205L))) {
      case (v, (shift, mask)) =>
        v.bitwiseOR(shiftright(v, shift)).bitwiseAND(lit(mask))
    }

  /** (a, b) recovered from a Morton key. */
  def deinterleave(z: Column): (Column, Column) =
    (compactBits(z), compactBits(shiftright(z, 1)))
}
