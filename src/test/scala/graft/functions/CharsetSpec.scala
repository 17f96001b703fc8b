package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Charset detection + decode (functions/Charset): WHATWG precedence
  * (BOM > header > meta-in-prelude > default), both meta forms in
  * document order, the 1024-byte prescan bound, quote/case variants,
  * the malformed corners that must fall through rather than capture
  * garbage, and the decode round-trips the detected name drives.
  */
class CharsetSpec extends SparkSpec {
  import spark.implicits._

  private def detectBytes(ct: String, body: Array[Byte]): (String, String) = {
    val (cs, src) = Charset.detect(col("ct"), col("body"))
    val r = Seq((ct, body)).toDF("ct", "body")
      .select(cs.as("c"), src.as("s")).collect().head
    (r.getString(0), r.getString(1))
  }

  private def detect(ct: String, body: String): (String, String) =
    detectBytes(ct, body.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private def decoded(ct: String, body: Array[Byte]): String = {
    val (cs, _) = Charset.detect(col("ct"), col("body"))
    Seq((ct, body)).toDF("ct", "body")
      .select(Charset.decodeWith(col("body"), cs).as("t")).collect().head.getString(0)
  }

  test("precedence: header parameter beats a contradicting meta; meta beats default") {
    assert(detect("text/html; charset=ISO-8859-1",
      """<html><head><meta charset="utf-8"></head></html>""") ===
      (("iso-8859-1", "header")))
    assert(detect("text/html",
      """<html><head><meta charset="utf-8"></head></html>""") ===
      (("utf-8", "meta")))
    assert(detect("text/html", "<html></html>") === (("utf-8", "default")))
  }

  test("BOM beats everything, even a lying header (WHATWG step 1)") {
    val utf8bom = Array(0xEF, 0xBB, 0xBF).map(_.toByte) ++
      "<html><body>x</body></html>".getBytes("UTF-8")
    assert(detectBytes("text/html; charset=ISO-8859-1", utf8bom) ===
      (("utf-8", "bom")))
    val le = Array(0xFF, 0xFE).map(_.toByte) ++ "<html></html>".getBytes("UTF-16LE")
    assert(detectBytes("text/html", le) === (("utf-16le", "bom")))
    val be = Array(0xFE, 0xFF).map(_.toByte) ++ "<html></html>".getBytes("UTF-16BE")
    assert(detectBytes("text/html; charset=latin-1", be) === (("utf-16be", "bom")))
  }

  test("meta prescan is bounded at 1024 bytes: a late declaration is ignored") {
    val late = "<html><head><!-- " + "x" * 1100 +
      " --><meta charset=\"ISO-8859-1\"></head></html>"
    assert(detect("text/html", late) === (("utf-8", "default")))
    // the same declaration inside the bound is honored
    val early = "<html><head><!-- " + "x" * 100 +
      " --><meta charset=\"ISO-8859-1\"></head></html>"
    assert(detect("text/html", early) === (("iso-8859-1", "meta")))
  }

  test("conflicting meta forms resolve by DOCUMENT order, not form priority") {
    assert(detect("text/html",
      "<meta http-equiv=\"Content-Type\" content=\"text/html; charset=ISO-8859-5\">" +
        "<meta charset=\"KOI8-R\">") === (("iso-8859-5", "meta")))
    assert(detect("text/html",
      "<meta charset=\"KOI8-R\">" +
        "<meta http-equiv=\"Content-Type\" content=\"text/html; charset=ISO-8859-5\">") ===
      (("koi8-r", "meta")))
  }

  test("both meta forms, quote and case variants") {
    assert(detect("text/html", "<meta charset=UTF-8>") === (("utf-8", "meta")))
    assert(detect("text/html", "<meta charset='Shift_JIS'>") === (("shift_jis", "meta")))
    assert(detect("text/html",
      """<meta http-equiv="Content-Type" content="text/html; charset=Windows-1252">""") ===
      (("windows-1252", "meta")))
    assert(detect("text/html",
      "<META HTTP-EQUIV='content-type' CONTENT='text/html; CHARSET=big5'>") ===
      (("big5", "meta")))
    assert(detect("Text/HTML; Charset=\"EUC-JP\"", "") === (("euc-jp", "header")))
    // attribute order is free in real HTML: content may precede http-equiv
    assert(detect("text/html",
      """<meta content="text/html; charset=gb2312" http-equiv="Content-Type">""") ===
      (("gb2312", "meta")))
  }

  test("malformed corners fall through: bare charset=, unrelated meta, decoys") {
    assert(detect("text/html; charset=", "<html></html>") === (("utf-8", "default")))
    assert(detect("text/html",
      """<meta name="description" content="charsets are fun">""") ===
      (("utf-8", "default")))
    // a non-meta tag carrying data-charset must not match (\scharset= needs
    // the attribute to START at a delimiter)
    assert(detect("text/html", """<div data-charset="koi8-r"></div>""") ===
      (("utf-8", "default")))
    // charset= INSIDE a quoted attribute value is not a declaration — the
    // attribute walk consumes quoted values whole (the r15 ADVICE decoy)
    assert(detect("text/html",
      """<meta name="description" content="all about charset=EBCDIC pages">""") ===
      (("utf-8", "default")))
    // and the decoy must not shadow a real declaration after it
    assert(detect("text/html",
      "<meta name=\"description\" content=\"all about charset=EBCDIC pages\">" +
        "<meta charset=\"UTF-8\">") === (("utf-8", "meta")))
  }

  test("decodeWith: detected name drives the decode, BOM stripped") {
    val text = "<html><body>wé café</body></html>"
    val l1 = detectBytes("text/html; charset=ISO-8859-1",
      text.getBytes("ISO-8859-1"))
    assert(l1 === (("iso-8859-1", "header")))
    assert(decoded("text/html; charset=ISO-8859-1",
      text.getBytes("ISO-8859-1")) === text)
    // UTF-8 with BOM: decoded text must NOT carry a U+FEFF prefix
    val withBom = Array(0xEF, 0xBB, 0xBF).map(_.toByte) ++ text.getBytes("UTF-8")
    assert(decoded("text/html; charset=ISO-8859-1", withBom) === text)
    // UTF-16LE: a blind UTF-8 read would be NUL-riddled garbage
    val le = Array(0xFF, 0xFE).map(_.toByte) ++ text.getBytes("UTF-16LE")
    assert(decoded("text/html", le) === text)
    val be = Array(0xFE, 0xFF).map(_.toByte) ++ text.getBytes("UTF-16BE")
    assert(decoded("text/html", be) === text)
    // windows-1252 maps onto the latin-1 arm over the planted byte range
    assert(decoded("text/html; charset=Windows-1252",
      text.getBytes("ISO-8859-1")) === text)
  }
}
