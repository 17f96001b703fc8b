package graft.functions

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
  * pure codegen'd string Columns — map-side over the archive scan, no
  * UDF. (Beyond-reference: the reference ingests databases, never raw
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

  /** Magic-byte sniff of the payload body. Binary signatures match at
    * byte 0 EXACTLY (a leading-whitespace `%PDF` is not a PDF); the
    * HTML tag signatures are whitespace-tolerant and case-insensitive
    * per the WHATWG table. Everything unrecognized falls back to
    * `text/plain` — the conservative route for a TEXT pipeline (an
    * unrecognized binary yields tokens downstream quality gates kill,
    * whereas dropping unrecognized text loses real documents).
    */
  def sniff(body: Column): Column = {
    val b = lower(ltrim(body))
    when(body.isNull, lit(null).cast("string"))
      .when(body.startsWith("%PDF"), lit("application/pdf"))
      .when(body.startsWith("\u0089PNG"), lit("image/png"))
      .when(body.startsWith("GIF87a") || body.startsWith("GIF89a"), lit("image/gif"))
      .when(body.startsWith("PK\u0003\u0004"), lit("application/zip"))
      .when(body.startsWith("\u001f\u008b"), lit("application/gzip"))
      .when(b.startsWith("<html") || b.startsWith("<!doctype html") ||
        b.startsWith("<head") || b.startsWith("<body"), lit("text/html"))
      .when(b.startsWith("<?xml"), lit("text/xml"))
      .otherwise(lit("text/plain"))
  }
}
