package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple banana cherry apple"),
    (2L, "apple banana banana banana"),
    (3L, "cherry cherry durian elderberry"),
    (4L, "fig grape apple banana cherry durian"),
    (5L, "zebra yak xylophone walrus"))
    .toDF("doc_id", "text")

  private val queries = Seq((100L, "apple cherry")).toDF("query_id", "qtext")

  test("invertedIndex: postings carry exact tf, doclens exact lengths") {
    val (postings, doclens) = Retrieval.invertedIndex(docs, "text", "doc_id")
    val p = postings.collect()
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("doc_id")) ->
        r.getAs[Long]("tf")).toMap
    assert(p(("apple", 1L)) === 2L)
    assert(p(("banana", 2L)) === 3L)
    assert(p.get(("apple", 3L)).isEmpty)
    val dl = doclens.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dl")).toMap
    assert(dl === Map(1L -> 4L, 2L -> 4L, 3L -> 4L, 4L -> 6L, 5L -> 4L))
  }

  test("bm25TopK ranks the doc matching BOTH terms first, skips non-matches") {
    val (postings, doclens) = Retrieval.invertedIndex(docs, "text", "doc_id")
    val top = Retrieval.bm25TopK(postings, doclens, queries, k = 10)
      .orderBy("rank").collect()
    // docs 1 and 4 match both query terms; doc 5 matches neither and must
    // be absent entirely (scoring never touches non-matching docs)
    assert(top.map(_.getAs[Long]("doc_id")).toSet === Set(1L, 2L, 3L, 4L))
    // doc 1: two 'apple' + one 'cherry' in dl=4 beats doc 4's one+one in dl=6
    assert(top.head.getAs[Long]("doc_id")  === 1L)
    val scores = top.map(_.getAs[Double]("score")).toSeq
    assert(scores === scores.sorted.reverse)
  }

  test("bm25TopK matches the hand-computed score on a single-term query") {
    val (postings, doclens) = Retrieval.invertedIndex(docs, "text", "doc_id")
    val top = Retrieval.bm25TopK(postings, doclens,
      Seq((7L, "durian")).toDF("query_id", "qtext"), k = 10).collect()
    // durian: df=2, N=5 → idf = ln(1 + 3.5/2.5); doc 3: tf=1, dl=4,
    // avgdl=22/5=4.4 → tfn = 2.5/(1+1.5*(0.25+0.75*4/4.4))
    val idf = math.log(1.0 + 3.5 / 2.5)
    def tfn(tf: Long, dl: Long) =
      tf * 2.5 / (tf + 1.5 * (0.25 + 0.75 * dl / 4.4))
    val exp3 = BigDecimal(idf * tfn(1, 4)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val got = top.map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    assert(got.keySet === Set(3L, 4L))
    assert(math.abs(got(3L) - exp3.toDouble) < 1e-9)
    assert(got(3L) > got(4L)) // same tf, shorter doc wins
  }

  test("heap ranking is identical to the window form") {
    val (postings, doclens) = Retrieval.invertedIndex(docs, "text", "doc_id")
    val q = Seq((100L, "apple cherry"), (101L, "banana durian zebra"))
      .toDF("query_id", "qtext")
    val heap = Retrieval.bm25TopK(postings, doclens, q, k = 3)
      .select("query_id", "rank", "doc_id").collect().toSet
    // reference: full score set ranked by a window
    val all = Retrieval.bm25TopK(postings, doclens, q, k = 100)
      .withColumn("wr", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("doc_id"))).cast("bigint"))
      .filter(col("wr") <= 3)
      .select("query_id", "wr", "doc_id").collect().toSet
    assert(heap === all)
  }

  test("persisted index round-trips: from-index search equals direct search") {
    val dir = java.nio.file.Files.createTempDirectory("bm25idx").toString
    Retrieval.writeIndex(docs, "text", "doc_id", dir)
    val (postings, doclens) = Retrieval.invertedIndex(docs, "text", "doc_id")
    val direct = Retrieval.bm25TopK(postings, doclens, queries, k = 5)
      .collect().map(_.toSeq).toSet
    val fromIdx = Retrieval.bm25TopKFromIndex(spark, dir, queries, k = 5)
      .collect().map(_.toSeq).toSet
    assert(fromIdx === direct)
  }

  test("mmrRerank demotes near-duplicates of an already-picked result") {
    // doc 1 and doc 2 point the same way (near-dups); doc 3 is orthogonal
    // with lower relevance. Relevance order: 1, 2, 3 — MMR must pick the
    // diverse doc 3 over the redundant doc 2 at rank 2: doc 2 scores
    // 0.75·0.98 − 0.25·~0.999 ≈ 0.485 < doc 3's 0.75·0.70 = 0.525.
    val cand = Seq(
      (7L, 1L, 0.99, Seq(1.0, 0.0)),
      (7L, 2L, 0.98, Seq(0.999, 0.04)),
      (7L, 3L, 0.70, Seq(0.0, 1.0)))
      .toDF("query_id", "doc_id", "rel", "vec")
    val got = Retrieval.mmrRerank(cand, k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("doc_id")))
    assert(got.toSeq === Seq((1L, 1L), (2L, 3L), (3L, 2L)))
    // rank 1 carries no penalty: mmr = 0.75 * rel exactly
    val first = Retrieval.mmrRerank(cand, k = 1).collect().head
    assert(math.abs(first.getAs[Double]("mmr") - 0.75 * 0.99) < 1e-9)
  }

  test("partitioned index: bm25TopKPruned equals the flat-index search " +
      "row-for-row, and the postings land hive-partitioned by tok_bucket") {
    val dir = java.nio.file.Files.createTempDirectory("bm25part").toFile
    dir.deleteOnExit()
    val flat = dir.getAbsolutePath + "/flat"
    val part = dir.getAbsolutePath + "/part"
    Retrieval.writeIndex(docs, "text", "doc_id", flat)
    Retrieval.writeIndexPartitioned(docs, "text", "doc_id", part, nBuckets = 4)

    // the layout is really partitioned: tok_bucket= directories exist
    val bucketDirs = new java.io.File(part + "/postings")
      .listFiles().filter(_.getName.startsWith("tok_bucket="))
    assert(bucketDirs.nonEmpty, "no tok_bucket= partition directories")

    val qs = Seq((100L, "apple cherry"), (101L, "durian")).toDF("query_id", "qtext")
    val a = Retrieval.bm25TopKFromIndex(spark, flat, qs, k = 10)
      .orderBy("query_id", "rank").collect().toSeq
    // no bucket count at the call site: the search reads n_buckets from
    // the index's own stats table, so write/search can never disagree
    val b = Retrieval.bm25TopKPruned(spark, part, qs, k = 10)
      .orderBy("query_id", "rank").collect().toSeq
    assert(a === b, "pruned search diverged from the flat-index search")
  }

  test("mmrRerank survives NaN relevance: NaN ranks below real scores, " +
      "an all-NaN shortlist yields no picks instead of crashing") {
    // doc 2 carries a NaN rel (e.g. an upstream 0/0): it must lose to every
    // real-scored doc but not crash the greedy argmax
    val mixed = Seq(
      (7L, 1L, 0.9, Seq(1.0, 0.0)),
      (7L, 2L, Double.NaN, Seq(0.0, 1.0)))
      .toDF("query_id", "doc_id", "rel", "vec")
    val got = Retrieval.mmrRerank(mixed, k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("doc_id")))
    assert(got.toSeq === Seq((1L, 1L)),
      "NaN-rel candidate must be unrankable, not picked or crashing")

    // the zero-norm-query shape: every rel NaN → empty result, no AIOOBE
    val allNaN = Seq(
      (8L, 1L, Double.NaN, Seq(1.0, 0.0)),
      (8L, 2L, Double.NaN, Seq(0.0, 1.0)))
      .toDF("query_id", "doc_id", "rel", "vec")
    assert(Retrieval.mmrRerank(allNaN, k = 2).count() === 0L)
  }

  test("rrfFuse: canonical 1/(60+rank) sums, rank ties broken by doc_id") {
    val a = Seq((1L, 10L, 1L), (1L, 20L, 2L)).toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 20L, 1L), (1L, 30L, 2L)).toDF("query_id", "doc_id", "rank")
    val fused = Retrieval.rrfFuse(Seq(a, b), k = 10)
      .orderBy("rank").collect()
    // doc 20: 1/62 + 1/61 beats doc 10: 1/61 and doc 30: 1/62
    assert(fused.map(_.getAs[Long]("doc_id")).toSeq === Seq(20L, 10L, 30L))
    assert(fused.head.getAs[Long]("n_lists") === 2L)
    val exp20 = (BigDecimal(1.0 / 62).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      + BigDecimal(1.0 / 61).setScale(6, BigDecimal.RoundingMode.HALF_UP)).toDouble
    assert(math.abs(fused.head.getAs[Double]("rrf") - exp20) < 1e-9)
    // a doc present in one list only still fuses (outer union semantics)
    assert(fused(1).getAs[Long]("n_lists") === 1L)
  }
}
