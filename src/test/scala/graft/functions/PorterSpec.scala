package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Porter (1980) stemmer — vocabulary pairs are from the algorithm paper's
  * own step examples.
  */
class PorterSpec extends SparkSpec {
  import spark.implicits._

  private val cases = Seq(
    // step 1a
    "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
    "caress" -> "caress", "cats" -> "cat",
    // step 1b (+ cleanup)
    "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
    "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
    "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
    "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
    "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail",
    "filing" -> "file",
    // step 1c
    "happy" -> "happi", "sky" -> "sky",
    // step 2
    "relational" -> "relat", "conditional" -> "condit", "rational" -> "ration",
    "valenci" -> "valenc", "hesitanci" -> "hesit", "digitizer" -> "digit",
    "radicalli" -> "radic", "differentli" -> "differ", "vileli" -> "vile",
    "analogousli" -> "analog", "vietnamization" -> "vietnam",
    "predication" -> "predic", "operator" -> "oper", "feudalism" -> "feudal",
    "decisiveness" -> "decis", "hopefulness" -> "hope",
    "callousness" -> "callous", "formaliti" -> "formal",
    "sensitiviti" -> "sensit", "sensibiliti" -> "sensibl",
    // step 3
    "triplicate" -> "triplic", "formative" -> "form", "formalize" -> "formal",
    "electriciti" -> "electr", "electrical" -> "electr", "hopeful" -> "hope",
    "goodness" -> "good",
    // step 4
    "revival" -> "reviv", "allowance" -> "allow", "inference" -> "infer",
    "airliner" -> "airlin", "gyroscopic" -> "gyroscop",
    "adjustable" -> "adjust", "defensible" -> "defens",
    "irritant" -> "irrit", "replacement" -> "replac",
    "adjustment" -> "adjust", "dependent" -> "depend",
    "adoption" -> "adopt", "communism" -> "commun", "activate" -> "activ",
    "angulariti" -> "angular", "homologous" -> "homolog",
    "effective" -> "effect", "bowdlerize" -> "bowdler",
    // step 5
    "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
    "controll" -> "control", "roll" -> "roll")

  test("stems the Porter paper's example vocabulary") {
    val bad = cases.collect {
      case (in, want) if Porter.stem(in) != want =>
        s"$in -> ${Porter.stem(in)} (want $want)"
    }
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("short words and idempotence") {
    assert(Porter.stem("a") === "a")
    assert(Porter.stem("is") === "is")
    for ((in, _) <- cases) {
      val once = Porter.stem(in)
      // stems are near-fixpoints; re-stemming a stem must never blow up
      assert(Porter.stem(once).nonEmpty)
    }
  }

  test("PorterStem expression matches the Scala function under codegen") {
    val df = cases.map(_._1).toDF("w")
      .select(col("w"), PorterStemColumn.porterStem(col("w")).as("s"))
    val got = df.as[(String, String)].collect().toMap
    for ((in, want) <- cases) assert(got(in) === want, s"expr stem of $in")
  }

  test("stemmedTokens collapses inflected forms to one vocabulary entry") {
    val toks = Seq("the cats hopping happily; motoring agreed")
      .toDF("t").select(TextStats.stemmedTokens(col("t")).as("toks"))
      .as[Seq[String]].head()
    assert(toks === Seq("the", "cat", "hop", "happili", "motor", "agre"))
  }
}
