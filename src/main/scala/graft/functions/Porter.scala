package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Porter stemming (F23; the reference lemmatizes tokens before TF-IDF —
  * /root/reference/notebooks/classifiers.ipynb cell 12. spaCy's
  * tagger-based lemmatizer needs a model download, so the offline-faithful
  * analog is the classic Porter (1980) suffix-stripping algorithm — no
  * data files, deterministic, and the standard IR normalization the
  * notebook's lemmas approximate).
  *
  * Implemented from the published algorithm description (steps 1a–5b over
  * the m = [C](VC)^m[V] measure). Pure function over ASCII lowercase —
  * callers tokenize first ([[TextStats.tokenize]] lowercases and strips
  * non-letters already).
  */
object Porter {

  private def isVowel(w: CharSequence, i: Int): Boolean = w.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => true
    case 'y' => i > 0 && !isVowel(w, i - 1)
    case _ => false
  }

  /** m = number of VC sequences in the word. */
  private def measure(w: CharSequence): Int = {
    var m = 0; var i = 0; var prevVowel = false
    while (i < w.length) {
      val v = isVowel(w, i)
      if (prevVowel && !v) m += 1
      prevVowel = v; i += 1
    }
    m
  }

  private def containsVowel(w: CharSequence): Boolean = {
    var i = 0
    while (i < w.length) { if (isVowel(w, i)) return true; i += 1 }
    false
  }

  private def endsDoubleConsonant(w: String): Boolean = {
    val n = w.length
    n >= 2 && w(n - 1) == w(n - 2) && !isVowel(w, n - 1)
  }

  /** *o — stem ends cvc where the final c is not w, x or y. */
  private def endsCvc(w: String): Boolean = {
    val n = w.length
    n >= 3 && !isVowel(w, n - 3) && isVowel(w, n - 2) && !isVowel(w, n - 1) &&
      "wxy".indexOf(w(n - 1)) < 0
  }

  /** Replace `suffix` with `repl` if the remaining stem has measure > `min`. */
  private def replaceIf(w: String, suffix: String, repl: String, min: Int): Option[String] =
    if (w.endsWith(suffix)) {
      val stem = w.substring(0, w.length - suffix.length)
      if (measure(stem) > min) Some(stem + repl) else Some(w)
    } else None

  private def firstRule(w: String, min: Int, rules: (String, String)*): String =
    rules.view.flatMap { case (s, r) => replaceIf(w, s, r, min) }.headOption.getOrElse(w)

  def stem(word: String): String = {
    if (word.length <= 2) return word
    var w = word

    // step 1a: plurals
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ies")) w = w.dropRight(2)
    else if (!w.endsWith("ss") && w.endsWith("s")) w = w.dropRight(1)

    // step 1b: -ed / -ing
    if (w.endsWith("eed")) {
      if (measure(w.dropRight(3)) > 0) w = w.dropRight(1)
    } else {
      val stripped =
        if (w.endsWith("ed") && containsVowel(w.dropRight(2))) Some(w.dropRight(2))
        else if (w.endsWith("ing") && containsVowel(w.dropRight(3))) Some(w.dropRight(3))
        else None
      stripped.foreach { s =>
        w =
          if (s.endsWith("at") || s.endsWith("bl") || s.endsWith("iz")) s + "e"
          else if (endsDoubleConsonant(s) && "lsz".indexOf(s.last) < 0) s.dropRight(1)
          else if (measure(s) == 1 && endsCvc(s)) s + "e"
          else s
      }
    }

    // step 1c: y → i after a vowel
    if (w.endsWith("y") && containsVowel(w.dropRight(1))) w = w.dropRight(1) + "i"

    // step 2 (m > 0) — longest-match order within each final letter
    w = firstRule(w, 0,
      "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
      "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
      "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
      "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
      "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")

    // step 3 (m > 0)
    w = firstRule(w, 0,
      "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
      "ical" -> "ic", "ful" -> "", "ness" -> "")

    // step 4 (m > 1): drop derivational suffixes
    val step4 = Seq("al", "ance", "ence", "er", "ic", "able", "ible", "ant",
      "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize")
    step4.find(w.endsWith) match {
      case Some("ion") =>
        val stem = w.dropRight(3)
        if (stem.nonEmpty && (stem.last == 's' || stem.last == 't') && measure(stem) > 1)
          w = stem
      case Some(s) =>
        val stem = w.substring(0, w.length - s.length)
        if (measure(stem) > 1) w = stem
      case None =>
    }

    // step 5a: trailing e
    if (w.endsWith("e")) {
      val stem = w.dropRight(1)
      val m = measure(stem)
      if (m > 1 || (m == 1 && !endsCvc(stem))) w = stem
    }
    // step 5b: -ll → -l when m > 1
    if (measure(w) > 1 && w.endsWith("ll")) w = w.dropRight(1)
    w
  }

  def stemUTF8(s: UTF8String): UTF8String = UTF8String.fromString(stem(s.toString))
}

/** Codegen'd Porter-stem expression (same pattern as [[DotProduct]]: a
  * static call inside whole-stage codegen — no UDF serialization, no
  * interpreter fallback).
  */
case class PorterStem(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "porter_stem"

  override protected def withNewChildInternal(newChild: Expression): PorterStem =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any =
    Porter.stemUTF8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Porter.stemUTF8($c)")
}

object PorterStemColumn {
  def porterStem(c: Column): Column =
    ColumnBridge.column(PorterStem(ColumnBridge.expr(c)))
}
