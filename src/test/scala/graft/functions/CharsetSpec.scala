package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Charset detection (functions/Charset): precedence (header > meta >
  * default), both meta forms, quote/case variants, and the malformed
  * corners that must fall through rather than capture garbage.
  */
class CharsetSpec extends SparkSpec {
  import spark.implicits._

  private def detect(ct: String, body: String): (String, String) = {
    val (cs, src) = Charset.detect(col("ct"), col("body"))
    val r = Seq((ct, body)).toDF("ct", "body")
      .select(cs.as("c"), src.as("s")).collect().head
    (r.getString(0), r.getString(1))
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

  test("malformed corners fall through: bare charset=, unrelated meta, attribute-name decoys") {
    assert(detect("text/html; charset=", "<html></html>") === (("utf-8", "default")))
    assert(detect("text/html",
      """<meta name="description" content="charsets are fun">""") ===
      (("utf-8", "default")))
    // a non-meta tag carrying data-charset must not match (\scharset= needs
    // the attribute to START at a delimiter)
    assert(detect("text/html", """<div data-charset="koi8-r"></div>""") ===
      (("utf-8", "default")))
  }
}
