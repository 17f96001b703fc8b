package graft.analysis

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JournalsSpec extends SparkSpec {
  import spark.implicits._

  private val outputs = Seq(
    (1, "1234-5678"), (2, "1234-5678; 8765-4321"), (3, "8765-4321"), (4, "0000-1111"))
    .toDF("output_id", "issns")
  private val scopus = Seq(("Journal A", "12345678", "3.5"))
    .toDF("title", "issns", "citescore")
  private val sjr = Seq(("87654321", "1,91", "44"))
    .toDF("issns", "sjr", "h_index")

  test("explodeIssns: split + dash-strip + explode (F17)") {
    val r = Journals.explodeIssns(outputs, "issns").select("issn").as[String].collect()
    assert(r.count(_ == "12345678") === 2)
    assert(r.length === 5)
  }

  test("journalCounts + rankedJournals: left joins on normalized ISSN, comma repair (J9/F18)") {
    val ranked = Journals.rankedJournals(
      Journals.journalCounts(outputs, "issns"), scopus, sjr)
    val byIssn = ranked.collect().map(r => r.getAs[String]("issn") -> r).toMap
    assert(byIssn("12345678").getAs[String]("citescore") === "3.5")
    assert(byIssn("87654321").getAs[Double]("sjr") === 1.91) // ',' → '.'
    assert(byIssn("87654321").getAs[Int]("h_index") === 44)
    assert(byIssn("00001111").getAs[Any]("citescore") === null)
  }

  test("missingFromRankings: null-conjunction filter + desc sort (P8/O2)") {
    val ranked = Journals.rankedJournals(Journals.journalCounts(outputs, "issns"), scopus, sjr)
    val missing = Journals.missingFromRankings(ranked).select("issn").as[String].collect()
    assert(missing.toSeq === Seq("00001111"))
  }

  test("coverageWithTotal appends the synthetic Total facet (A8/U2)") {
    val ranked = Journals.rankedJournals(Journals.journalCounts(outputs, "issns"), scopus, sjr)
    val cov = Journals.coverageWithTotal(ranked).collect()
      .map(r => r.getAs[String]("ranking") -> r.getAs[Long]("n_journals")).toMap
    assert(cov("Total") === 3)
    assert(cov("CiteScore") === 1)
  }
}

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  // two trivially separable "topics"
  private val docs = (0 until 40).map { i =>
    if (i % 2 == 0) (i.toLong, "botany plants flowers leaves roots stems botany plants", "bio")
    else (i.toLong, "quarks bosons particles collider physics quarks bosons", "phys")
  }.toDF("doc_id", "text", "topic")

  test("TF-IDF + LogisticRegression pipeline separates trivial topics (classifiers.ipynb cells 14-18)") {
    val (_, accuracy) = Classifier.trainAndScore(docs, "text", "topic")
    assert(accuracy === 1.0) // linearly separable fixture
  }

  test("Naive Bayes variant (the notebook's promised second classifier) also separates the fixture") {
    val (_, accuracy) = Classifier.trainAndScore(docs, "text", "topic",
      makePipeline = Classifier.naiveBayesPipeline)
    assert(accuracy >= 0.9, s"NB accuracy $accuracy")
  }

  test("LinearSVC variant (the notebook's literal SVC model) passes the same gate") {
    val (_, accuracy) = Classifier.trainAndScore(docs, "text", "topic",
      makePipeline = Classifier.linearSvcPipeline)
    assert(accuracy === 1.0, s"SVC accuracy $accuracy")
  }

  test("balanced class weights: w(c) = n / (k * n_c), rarer class weighted higher") {
    val skewed = (Seq.fill(30)("alpha") ++ Seq.fill(10)("beta")).zipWithIndex
      .map { case (t, i) => (i.toLong, s"doc $i", t) }.toDF("doc_id", "text", "topic")
    val w = Classifier.withBalancedWeights(skewed, "topic")
      .select("topic", "class_weight").distinct()
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(w("alpha") - 40.0 / (2 * 30)) < 1e-9)
    assert(math.abs(w("beta") - 40.0 / (2 * 10)) < 1e-9)
    assert(w("beta") > w("alpha"))
  }

  test("stratified split keeps both classes in train (cell 16)") {
    val (train, test) = Classifier.stratifiedSplit(
      Classifier.tokenized(docs, "text"), "topic", 0.8, seed = 42L)
    assert(train.select("topic").distinct().count() === 2)
    assert(train.count() + test.count() === 40)
  }

  test("confusionMatrix: diagonal dominates on the separable fixture (cell 18)") {
    val (model, _) = Classifier.trainAndScore(docs, "text", "topic")
    val cm = Classifier.confusionMatrix(model, docs, "text", "topic")
      .collect().map(r => (r.getDouble(0), r.getDouble(1)) -> r.getLong(2)).toMap
    val diag = cm.collect { case ((l, p), n) if l == p => n }.sum
    assert(diag === 40L) // every fixture doc on the diagonal
  }

  test("lowConfidenceOutliers: ambiguous doc is the confidence outlier (outliers.ipynb cells 4-6)") {
    // the separable fixture plus ONE doc mixing both topics' vocabulary —
    // its winning-class probability sits far below the confident mass
    val ambiguous = Seq((999L, "football pitch neural network striker gradient goal descent", "sports"))
      .toDF("doc_id", "text", "topic")
    val all = docs.unionByName(ambiguous)
    val (model, _) = Classifier.trainAndScore(docs, "text", "topic")
    val outliers = Classifier.lowConfidenceOutliers(model, all, "text", zThreshold = -2.5)
    val ids = outliers.select("doc_id").as[Long].collect().toSet
    assert(ids.contains(999L), "the mixed-vocabulary doc must be a confidence outlier")
    val toks = Classifier.outlierTokenCounts(outliers, all, "text")
      .select("token").as[String].collect()
    assert(toks.nonEmpty && toks.length <= 10)
  }

  test("PCA(2) projection emits 2-dim vectors (cell 32)") {
    val (model, _) = Classifier.trainAndScore(docs, "text", "topic")
    val p = Classifier.pca2(model, docs, "text").head()
    assert(p.getAs[org.apache.spark.ml.linalg.Vector]("pca").size === 2)
  }
}
