package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the pure cores of the native expressions — these run
  * WITHOUT a SparkSession (the Spark-side equivalence of each expression
  * is covered by its own spec), so scalacheck can hammer them with
  * hundreds of inputs cheaply.
  */
object FunctionProperties extends Properties("graft.functions") {

  private val word: Gen[String] =
    Gen.chooseNum(1, 20).flatMap(n => Gen.stringOfN(n, Gen.alphaLowerChar))

  property("Porter.stem never crashes, never empties, never grows") =
    forAll(Gen.asciiPrintableStr) { s =>
      val out = Porter.stem(s)
      out != null && out.length <= s.length && (s.isEmpty || out.nonEmpty)
    }

  property("Porter.stem: regular plural converges with its base") =
    forAll(word) { w =>
      // the classic IR property for regular words; words ending s/y/e have
      // their own suffix rules
      (w.length < 3 || w.endsWith("s") || w.endsWith("y") || w.endsWith("e")) ||
        Porter.stem(w + "s") == Porter.stem(w)
    }

  property("PartialRatio bounded 0-100") =
    forAll(Gen.asciiPrintableStr, Gen.asciiPrintableStr) { (a, b) =>
      val r = PartialRatio.compute(a, b)
      r >= 0 && r <= 100
    }

  property("PartialRatio: identity and verbatim containment score 100") =
    forAll(word, word, word) { (pre, mid, post) =>
      PartialRatio.compute(mid, mid) == 100 &&
        PartialRatio.compute(mid, pre + mid + post) == 100
    }

  property("PartialRatio symmetric") =
    forAll(word, word) { (a, b) =>
      PartialRatio.compute(a, b) == PartialRatio.compute(b, a)
    }

  private val vec16: Gen[List[Double]] = Gen.listOfN(16, Gen.chooseNum(-100.0, 100.0))

  property("DotProduct.dot equals the sequential double fold EXACTLY") =
    forAll(vec16, vec16) { (a, b) =>
      val got = DotProduct.dot(
        ArrayData.toArrayData(a.toArray), ArrayData.toArrayData(b.toArray))
      val ref = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
      // bit-for-bit: oracle determinism depends on the fold order matching
      java.lang.Double.compare(got, ref) == 0
    }

  property("DotProduct.dot: zero annihilates; length mismatch folds the shorter prefix") =
    forAll(Gen.listOfN(8, Gen.chooseNum(-10.0, 10.0))) { a =>
      val zeros = Array.fill(8)(0.0)
      val z = DotProduct.dot(
        ArrayData.toArrayData(a.toArray), ArrayData.toArrayData(zeros))
      val short = a.take(4)
      val p = DotProduct.dot(
        ArrayData.toArrayData(a.toArray), ArrayData.toArrayData(short.toArray))
      val ref = short.zip(a).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
      z == 0.0 && java.lang.Double.compare(p, ref) == 0
    }

  property("Porter.stem idempotent-safe: re-stemming a stem never crashes or grows") =
    forAll(word) { w =>
      val once = Porter.stem(w)
      val twice = Porter.stem(once)
      twice.nonEmpty && twice.length <= once.length
    }

  // --- MisraGries.Summary: the MG invariants under random streams + merges

  private val stream: Gen[List[Int]] =
    Gen.chooseNum(0, 400).flatMap(n => Gen.listOfN(n, Gen.chooseNum(0, 30)))

  private def summarize(items: Seq[Int], k: Int): MisraGries.Summary = {
    val s = new MisraGries.Summary(k)
    items.foreach(i => s.add(i, 1L, () => i))
    s
  }

  private def effective(s: MisraGries.Summary): Map[Int, Long] = {
    val b = scala.collection.mutable.Map.empty[Int, Long]
    s.foreachEffective((item, n) => b(item.asInstanceOf[Int]) = n)
    b.toMap
  }

  private def mgInvariants(est: Map[Int, Long], items: Seq[Int], k: Int): Prop = {
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = items.size.toLong
    val bound = n / (k + 1)
    Prop.all(
      Prop(est.size <= k) :| "at most k entries",
      Prop(est.forall { case (i, e) => e >= 1 && e <= exact.getOrElse(i, 0L) }) :|
        "estimates positive, never above exact",
      Prop(est.forall { case (i, e) => exact(i) - e <= bound }) :|
        "undercount within N/(k+1)",
      Prop(exact.forall { case (i, c) => c <= bound || est.contains(i) }) :|
        "heavy items present")
  }

  property("MisraGries single-stream invariants (random streams, random k)") =
    forAll(stream, Gen.chooseNum(1, 12)) { (items, k) =>
      mgInvariants(effective(summarize(items, k)), items, k)
    }

  property("MisraGries merge invariants (random split point, merged summaries)") =
    forAll(stream, stream, Gen.chooseNum(2, 12)) { (a, b, k) =>
      val merged = summarize(a, k)
      val other = summarize(b, k)
      other.foreachEffective((item, n) => merged.add(item, n, () => item))
      mgInvariants(effective(merged), a ++ b, k)
    }
}
