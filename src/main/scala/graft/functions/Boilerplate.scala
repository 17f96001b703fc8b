package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Main-content extraction (boilerplate removal) — the block-level
  * link-density family (jusText, Kohlschütter's Boilerpipe): segment a
  * page into block-level elements, score each block by how much of its
  * text lives inside anchors, and keep only low-link-density blocks of
  * non-trivial length. A training pipeline that ships raw `html_text`
  * ships the nav bars and footers of every page on a site; this tier is
  * what strips the sitewide chrome before dedup/quality ever run.
  *
  * Beyond-reference by design (the reference has no HTML source at all);
  * the variant implemented here measures density in TOKENS rather than
  * characters — same discrimination on real chrome (nav/footer blocks are
  * all-anchor, content blocks are mostly plain text), but exactly
  * replayable arithmetic for the oracle.
  *
  * Every function is a pure `Column` composition (codegen'd regexp +
  * string ops, map-side). The intended shape at scale is EXPLODED block
  * rows — a real page has ~10²–10³ blocks, so per-block work distributes
  * and the per-doc reassembly is one hash aggregate — not per-row
  * higher-order lambdas over the block array (interpreted, and the whole
  * page's work lands in one task row).
  */
object Boilerplate {

  /** Block-level segmentation: the contents of `<p>`/`<div>` elements, in
    * document order (the backreference keys the close tag to the open
    * tag; the word boundary keeps `<pre>`/`<picture>` from matching as
    * `p`-blocks and scanning to a distant `</p>`). Non-greedy, so the
    * first matching close bounds each block — the flat-block layout real
    * extractors normalize to before scoring.
    */
  def blocks(body: Column): Column =
    regexp_extract_all(body, lit("(?s)<(p|div)\\b[^>]*>(.*?)</\\1>"), lit(2))

  /** A block's visible text: inline tags stripped. The fixture (like
    * sane HTML) separates inline elements with literal whitespace, so
    * stripping with the empty string never fuses adjacent words.
    */
  def blockText(raw: Column): Column =
    trim(regexp_replace(raw, "<[^>]*>", ""))

  /** The block's anchor-text run — the numerator of link density (the
    * word boundary keeps `<abbr>`/`<article>` out of the anchor class).
    */
  def linkText(raw: Column): Column =
    trim(array_join(regexp_extract_all(raw, lit("(?s)<a\\b[^>]*>(.*?)</a>"), lit(1)), " "))

  /** Whitespace token count; empty string counts 0 (split of "" yields
    * one empty element). HOF-free on purpose: `filter()` is a
    * CodegenFallback higher-order function and this runs once per
    * EXPLODED block row — the hot path — so the empty case is handled
    * with a `when` instead (inputs come trimmed from [[blockText]] /
    * [[linkText]], so split never yields interior empties).
    */
  def tokenCount(text: Column): Column =
    when(length(text) === 0, lit(0L))
      .otherwise(size(split(text, "\\s+")).cast("long"))

  /** The content verdict: link density (anchor tokens / all tokens)
    * under `maxLinkDensity` AND at least `minTokens` tokens. The density
    * guard kills nav/footer chrome (density → 1); the length guard kills
    * the one-line fragments that survive it (copyright lines, breadcrumb
    * stubs). A link-BEARING block with enough plain text passes — the
    * case a naive "has links ⇒ boilerplate" rule misclassifies.
    */
  def isContent(nToks: Column, nLinkToks: Column,
      minTokens: Int = 3, maxLinkDensity: Double = 0.35): Column =
    (nLinkToks.cast("double") / greatest(nToks.cast("double"), lit(1.0))
      < lit(maxLinkDensity)) && (nToks >= lit(minTokens.toLong))
}
