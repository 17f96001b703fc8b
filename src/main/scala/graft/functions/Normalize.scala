package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization — the canonicalization step a training
  * pipeline runs between charset decode and dedup/hashing: the same
  * visible text arrives from the web in different code-point sequences
  * (precomposed `é` U+00E9 vs decomposed `e` + combining acute U+0301;
  * different sources, editors and OSes emit different forms), and every
  * byte-keyed stage downstream — exact dedup, MinHash shingles, BM25
  * terms — silently treats them as distinct documents unless the
  * sequences are folded first. NFC (canonical composition) is the
  * standard fold (Unicode TR15); the curation pipeline's text-dedup
  * tier hashes NFC'd text so composition differences never block a
  * collapse.
  *
  * Execution shape: one static JVM call per row inside whole-stage
  * codegen (the `HtmlTextExtract` pattern). The pure-ASCII fast path —
  * the overwhelming majority of real corpus rows — returns the INPUT
  * object after a byte scan, no transcode and no allocation;
  * `Normalizer.isNormalized`'s quick-check handles the already-NFC
  * non-ASCII majority with one decode pass.
  */
object Normalize {

  def nfcUTF8(s: UTF8String): UTF8String = {
    // ASCII is closed under NFC: scan bytes, skip the String round-trip
    var i = 0
    val n = s.numBytes()
    var ascii = true
    while (ascii && i < n) {
      if ((s.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Codegen'd NFC normalization (one static call per row inside
  * whole-stage codegen, the `HtmlTextExtract` pattern).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc"

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any =
    Normalize.nfcUTF8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Normalize.nfcUTF8($c)")
}

object NormalizeColumn {
  def nfc(c: Column): Column = ColumnBridge.column(NfcNormalize(ColumnBridge.expr(c)))
}
