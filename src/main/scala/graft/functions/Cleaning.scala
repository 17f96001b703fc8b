package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** String-cleaning expression library (SURVEY §2.8 F1–F4).
  *
  * Reference semantics: `clean_string` /root/reference/synth/utils.py:69-87,
  * `find_names` utils.py:56-66, `to_datetime` utils.py:90-102,
  * `clean_institution` utils.py:105-124.
  *
  * Spark-first design: every function is a composition of codegen'd builtin
  * expressions (`regexp_replace`, `trim`, `when`…) so the whole chain stays
  * inside WholeStageCodegen — no UDF boundary, no serialization, columnar all
  * the way down. The HTML strip is a regex tag-stripper + entity decode (the
  * reference shells out to BeautifulSoup; the observable contract is only
  * "markup removed, whitespace collapsed, NULL when nothing word-like
  * remains", which regexes express exactly).
  */
object Cleaning {

  /** Remove HTML/XML tags and decode the common entities (utils.py:76-77).
    * Tag text is replaced by a space so `a<br>b` keeps a word boundary, as
    * BeautifulSoup's `get_text` does with separators collapsed later.
    */
  def stripHtml(c: Column): Column = {
    val noTags = regexp_replace(c, "<[^>]*>", " ")
    Seq(
      "&nbsp;" -> " ",
      "&amp;"  -> "&",
      "&lt;"   -> "<",
      "&gt;"   -> ">",
      "&quot;" -> "\"",
      "&#39;"  -> "'"
    ).foldLeft(noTags) { case (col, (ent, rep)) =>
      regexp_replace(col, ent, java.util.regex.Matcher.quoteReplacement(rep))
    }
  }

  /** Full `clean_string` contract (utils.py:69-87):
    *  1. collapse `[\r\n\t]+` runs to one space
    *  2. strip HTML (only when markup present — keeps the common no-markup
    *     path a pure whitespace pipeline, and oracle-expressible in SQL)
    *  3. ` ` (nbsp) → space
    *  4. collapse multi-space runs
    *  5. trim
    *  6. NULL when empty or no word character (`\w`) remains
    */
  def cleanString(c: Column): Column = CleanStringColumn.cleanString(c)

  /** The original builtin-chain composition of `cleanString`, kept as the
    * reference twin: CleaningSpec pins the fused [[CleanStringExpr]]
    * bit-identical to it (this chain's semantics are what the DuckDB
    * oracles replay).
    */
  private[functions] def cleanStringChain(c: Column): Column = {
    val ws        = regexp_replace(c, "[\\r\\n\\t]+", " ")
    val html      = when(ws.contains("<") || ws.contains("&"), stripHtml(ws)).otherwise(ws)
    val nbsp      = regexp_replace(html, " ", " ")
    val collapsed = regexp_replace(nbsp, " {2,}", " ")
    val trimmed   = trim(collapsed)
    when(trimmed.isNull || length(trimmed) === 0 || !trimmed.rlike("\\w"),
      lit(null).cast("string")
    ).otherwise(trimmed)
  }

  /** `clean_string` with the strict tokenizer in the HTML step: the
    * reference unconditionally routes text through BeautifulSoup
    * (utils.py:81-83); this variant routes through [[HtmlText]] — a real
    * tolerant parser with BS4-like no-separator text joins — instead of
    * the oracle-expressible regex analog above. Same surrounding
    * whitespace/NULL contract. Not SQL-oracle-expressible by nature;
    * pinned by HtmlTextSpec's stdlib-parser goldens.
    */
  def cleanStringStrict(c: Column): Column = {
    val ws        = regexp_replace(c, "[\\r\\n\\t]+", " ")
    val text      = HtmlTextColumn.htmlText(ws)
    val nbsp      = regexp_replace(text, " ", " ")
    val collapsed = regexp_replace(nbsp, " {2,}", " ")
    val trimmed   = trim(collapsed)
    when(trimmed.isNull || length(trimmed) === 0 || !trimmed.rlike("\\w"),
      lit(null).cast("string")
    ).otherwise(trimmed)
  }

  /** `find_names` (utils.py:56-66): normalize author-list separators
    * (` and ` / `&` → `; `), then extract name-like tokens
    * `([^\W\d_]{3,}[-' ]?)+` as an array.
    */
  def findNames(c: Column): Column = {
    val joined = regexp_replace(c, " and |&", "; ")
    regexp_extract_all(joined, lit("([^\\W\\d_]{3,}[-' ]?)+"), lit(0))
  }

  /** `to_datetime` (utils.py:90-102): parse the Java-epoch-style format
    * `"Mon Jan 02 15:04:05 GMT 2006"`; falsey input → NULL (the reference
    * returns None for '' / None rather than raising).
    *
    * Spark ≥3.0 forbids day-of-week (`EEE`) in *parse* patterns; the day
    * name is redundant information, so it is stripped before parsing —
    * byte-identical results to the reference's `strptime`.
    */
  def toDatetimeLegacy(c: Column): Column =
    when(c.isNull || length(trim(c)) === 0, lit(null).cast("timestamp"))
      .otherwise(to_timestamp(
        regexp_replace(c, "^[A-Za-z]{3} ", ""), "MMM dd HH:mm:ss zzz yyyy"))

  /** `clean_institution` (utils.py:105-124): clean, then alias-map lookup
    * (broadcast map column, e.g. `typedLit(aliasMap)`), `'nil'` sentinel →
    * NULL, unmatched → cleaned original.
    */
  def cleanInstitution(c: Column, aliases: Column): Column = {
    val cleaned = cleanString(c)
    val mapped  = coalesce(element_at(aliases, cleaned), cleaned)
    when(mapped === "nil", lit(null).cast("string")).otherwise(mapped)
  }

  /** F6 (etl.py:506-534): MySQL TINYINT → Boolean with Python `bool(None) ==
    * False` semantics — NULL maps to false, not NULL.
    */
  def tinyintToBool(c: Column): Column =
    coalesce(c =!= 0, lit(false))
}
