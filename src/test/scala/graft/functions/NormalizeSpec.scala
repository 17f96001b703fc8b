package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unicode NFC normalization (functions/Normalize): composition folding,
  * the ASCII no-copy fast path, already-normalized pass-through, and
  * null safety. Unicode escapes throughout — a source-level decomposed
  * sequence is one editor-normalization away from silently becoming the
  * precomposed form and making the test vacuous.
  */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def nfc(s: String): String =
    Seq(Tuple1(s)).toDF("t")
      .select(NormalizeColumn.nfc(col("t"))).collect().head.getString(0)

  test("decomposed sequences fold to precomposed (NFC)") {
    assert(nfc("we\u0301") === "w\u00e9") // e + combining acute
    assert(nfc("A\u030angstro\u0308m") === "\u00c5ngstr\u00f6m")
    // precomposed input passes through unchanged
    assert(nfc("w\u00e9") === "w\u00e9")
    // NFC composes but does NOT do compatibility folds (that's NFKC)
    assert(nfc("ﬁ") === "ﬁ") // fi ligature survives
  }

  test("ASCII and empty inputs return unchanged; null stays null") {
    assert(nfc("plain ascii text 123") === "plain ascii text 123")
    assert(nfc("") === "")
    val r = Seq(Tuple1(null: String)).toDF("t")
      .select(NormalizeColumn.nfc(col("t"))).collect().head
    assert(r.isNullAt(0))
  }

  test("static kernel: ASCII fast path returns the input OBJECT (no allocation)") {
    import org.apache.spark.unsafe.types.UTF8String
    val a = UTF8String.fromString("ascii only")
    assert(Normalize.nfcUTF8(a) eq a)
    val pre = UTF8String.fromString("d\u00e9j\u00e0 vu") // already NFC
    assert(Normalize.nfcUTF8(pre) eq pre)
    val dec = UTF8String.fromString("de\u0301ja\u0300 vu")
    assert(Normalize.nfcUTF8(dec).toString === "d\u00e9j\u00e0 vu")
  }
}
