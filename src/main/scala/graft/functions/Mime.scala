package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Content-type normalization + magic-byte MIME sniffing for the WET
  * gate's untrusted half: real crawls carry LYING `Content-Type`
  * headers constantly (PDFs declared `text/html`, HTML served as
  * `application/octet-stream`), and a pipeline that routes payloads by
  * the declared type alone ships PDF bytes through the HTML extractor
  * — garbage tokens poisoning every downstream text statistic — while
  * throwing away perfectly good HTML hiding behind a generic header.
  * The sniffer is a simplified WHATWG MIME-Sniffing table
  * (https://mimesniff.spec.whatwg.org §6-7: match the payload's
  * leading byte pattern, whitespace-tolerant for the HTML tags): the
  * handful of signatures a text-corpus pipeline must distinguish, as
  * pure codegen'd Columns — map-side over the archive scan, no UDF.
  * (Beyond-reference: the reference ingests databases, never raw
  * HTTP payloads.)
  */
object Mime {

  /** The declared media type, normalized: parameters stripped at the
    * first `;`, trimmed, lowercased (RFC 9110 §8.3.1 — the type is
    * case-insensitive; `Application/PDF; version=1.4` ⇒
    * `application/pdf`).
    */
  def normalize(contentType: Column): Column =
    lower(trim(substring_index(contentType, ";", 1)))

  /** Magic-byte sniff of the payload. The binary-signature tier
    * compares RAW BYTES (`bodyBytes`, a binary column) at offset 0
    * EXACTLY — a decoded-string compare would mangle non-UTF-8 magic
    * (0x89 'PNG', 0x1f 0x8b gzip) to U+FFFD and never match real
    * payloads. The HTML/XML tag tier runs on the decoded string
    * (`body`), skipping the WHATWG whitespace set (\t \n \f \r space)
    * and matching case-insensitively per the sniffing table.
    * Everything unrecognized falls back to `text/plain` — the
    * conservative route for a TEXT pipeline (an unrecognized binary
    * yields tokens downstream quality gates kill, whereas dropping
    * unrecognized text loses real documents).
    */
  def sniff(bodyBytes: Column, body: Column): Column = {
    def magic(sig: Array[Byte]): Column =
      bodyBytes.substr(lit(1), lit(sig.length)) === lit(sig)
    def ascii(s: String): Array[Byte] = s.getBytes(StandardCharsets.US_ASCII)
    // WHATWG §7.1 step 4: skip leading HTML whitespace before tag matches
    val b = lower(regexp_replace(body, "^[\\t\\n\\f\\r ]+", ""))
    when(bodyBytes.isNull, lit(null).cast("string"))
      .when(magic(ascii("%PDF")), lit("application/pdf"))
      .when(magic(Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)),
        lit("image/png"))
      .when(magic(ascii("GIF87a")) || magic(ascii("GIF89a")), lit("image/gif"))
      .when(magic(Array('P'.toByte, 'K'.toByte, 0x03.toByte, 0x04.toByte)),
        lit("application/zip"))
      .when(magic(Array(0x1f.toByte, 0x8b.toByte)), lit("application/gzip"))
      .when(b.startsWith("<html") || b.startsWith("<!doctype html") ||
        b.startsWith("<head") || b.startsWith("<body"), lit("text/html"))
      .when(b.startsWith("<?xml"), lit("text/xml"))
      .otherwise(lit("text/plain"))
  }
}
