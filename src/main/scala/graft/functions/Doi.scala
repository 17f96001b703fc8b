package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** DOI extraction / normalization cascade (SURVEY §2.8 F11–F15, §2.6 O5).
  *
  * Reference semantics: /root/reference/synth/parsers/doi.py —
  * `doi_regex` :44-66, `doi_regex_strict` :68-89, `mapress_regex` :91-103,
  * `nature_regex` :105-120, `cambridge_regex` :122-130, stage cascade
  * `dois` :13-42 (first stage that yields wins), `fix` URL-decode :32-34.
  *
  * Spark-first: each stage is a `regexp_extract` column; the ordered
  * "first stage that matches" generator becomes a single `coalesce` over the
  * stage columns (O5) — one codegen'd projection instead of a per-row Python
  * generator. Network stages (elsevier_api…pubmed, doi.py:129-223) are
  * modeled as joins against a pre-fetched cache table (SURVEY S7/S8), never
  * inline HTTP in the hot path.
  */
object Doi {

  /** Crossref-recommended DOI pattern (doi.py:53). Java regex, case folded
    * via (?i) to mirror `re.I`.
    */
  val DoiRegex = "(?i)(10\\.\\d{4,9}/[-._;()/:A-Z0-9]+)"

  /** Stricter variant excluding separator-ish chars (doi.py:77). */
  val DoiRegexStrict = "(?i)(10.\\d{4,9}/[-._A-Z0-9]+)"

  private val extras = "(?i)[./](e?pdf|abstract|full|short)"

  /** Normalize an extracted DOI (doi.py:58-65): uppercase, strip trailing
    * `.` runs, cut URL artifacts (`.pdf`, `/abstract`, …).
    */
  def normalize(c: Column): Column = {
    val up    = upper(c)
    val noDot = regexp_replace(up, "\\.+$", "")
    // `extras_regex.split(doi)[0]` == everything before the first artifact
    regexp_replace(noDot, extras + ".*$", "")
  }

  // nullif, not when(length(c) > 0, c): the when-form inlines `c` twice
  // and re-runs the stage regex per reference (same fix as DoiNetwork)
  private def nonEmpty(c: Column): Column = nullif(c, lit(""))

  /** Stage 1: standard DOI regex (doi.py:44-66). NULL when no match. */
  def doiRegex(c: Column): Column =
    normalize(nonEmpty(regexp_extract(c, DoiRegex, 1)))

  /** Stage 2: strict DOI regex (doi.py:68-89). */
  def doiRegexStrict(c: Column): Column =
    normalize(nonEmpty(regexp_extract(c, DoiRegexStrict, 1)))

  /** Stage 3: mapress/biotaxa URL → `10.11646/` DOI (doi.py:91-103). */
  def mapress(c: Column): Column =
    // concat null-propagates: no isNotNull guard (which would re-run the
    // extract a second time)
    concat(lit("10.11646/"),
      nonEmpty(regexp_extract(c, "(\\w+taxa\\.\\d{1,4}\\.\\d+\\.\\d+)", 1)))

  /** Stage 4: Nature article ids → `10.1038/` (doi.py:105-120), both the
    * `sNNNNN-NNN-NNNNN-x` form and `nature.com/articles/<id>`.
    */
  def nature(c: Column): Column = coalesce(
    concat(lit("10.1038/"),
      nonEmpty(regexp_extract(c, "(s\\d{5}-\\d{3}-\\d{5}-.)", 1))),
    concat(lit("10.1038/"),
      nonEmpty(regexp_extract(c, "nature\\.com/articles/([^/]+)", 1))))

  /** Stage 5: Cambridge `fileId=S…` → `10.1017/` (doi.py:122-130). */
  def cambridge(c: Column): Column =
    concat(lit("10.1017/"), nonEmpty(regexp_extract(c, "fileId=(S[A-Z0-9]+)", 1)))

  /** F15 (doi.py:32-34): `fix=True` pre-step — URL-decode `+`/%xx and drop
    * spaces before extraction.
    */
  def urlFix(c: Column): Column =
    regexp_replace(url_decode(regexp_replace(c, "\\+", "%20")), " ", "")

  /** O5: the offline extraction cascade — first matching stage wins,
    * replacing the generator at doi.py:13-42 with one `coalesce`.
    */
  def extractDoi(c: Column): Column =
    coalesce(doiRegex(c), doiRegexStrict(c), mapress(c), nature(c), cambridge(c))

  /** Full generator parity (doi.py:13-42 yields EVERY stage's candidate
    * with the extracting method's name): array of (stage, doi) structs,
    * non-matching stages filtered out. `explode` it to get the reference's
    * per-candidate stream for match-rate analyses
    * (notebooks/unidentified.ipynb uses the stage names).
    */
  def extractAllStages(c: Column): Column = {
    val stages = Seq(
      "doi_regex"        -> doiRegex(c),
      "doi_regex_strict" -> doiRegexStrict(c),
      "mapress_regex"    -> mapress(c),
      "nature_regex"     -> nature(c),
      "cambridge_regex"  -> cambridge(c))
    filter(
      array(stages.map { case (n, e) => struct(lit(n).as("stage"), e.as("doi")) }: _*),
      s => s.getField("doi").isNotNull)
  }
}
