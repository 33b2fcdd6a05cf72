package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The classic Porter stemming algorithm (Porter 1980, "An algorithm
  * for suffix stripping" — the published rule tables implemented
  * verbatim), the normalization layer of an IR/text pipeline between
  * tokenization and [[TextFunctions]] scoring / TextSearch retrieval:
  * inflected forms collapse ("running"/"runs"/"run") so term
  * statistics and postings merge.
  *
  * Contract: lowercase ASCII input (lowercase upstream — uppercase
  * letters are treated as consonants, the raw published behavior);
  * words of length <= 2 are returned untouched (the reference
  * implementation's guard); null → null. Deterministic, pure,
  * engine-portable: the q228 oracle carries hand-derived stems for the
  * gate vocabulary, and the spec pins the published example pairs from
  * the paper, so the implementation is cross-checked against the
  * ALGORITHM, not against itself. */
object PorterStemmer {

  private def isVowel(w: Array[Char], i: Int): Boolean = w(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => true
    case 'y' => i > 0 && !isVowel(w, i - 1)
    case _ => false
  }

  /** m = number of VC sequences in w[0, len). */
  private def measure(w: Array[Char], len: Int): Int = {
    var m = 0
    var i = 0
    while (i < len && !isVowel(w, i)) i += 1
    while (i < len) {
      while (i < len && isVowel(w, i)) i += 1
      if (i < len) {
        m += 1
        while (i < len && !isVowel(w, i)) i += 1
      }
    }
    m
  }

  private def containsVowel(w: Array[Char], len: Int): Boolean = {
    var i = 0
    while (i < len) { if (isVowel(w, i)) return true; i += 1 }
    false
  }

  private def endsDoubleC(w: Array[Char], len: Int): Boolean =
    len >= 2 && w(len - 1) == w(len - 2) && !isVowel(w, len - 1)

  /** *o: stem ends consonant-vowel-consonant, last not w/x/y. */
  private def cvc(w: Array[Char], len: Int): Boolean =
    len >= 3 && !isVowel(w, len - 3) && isVowel(w, len - 2) &&
      !isVowel(w, len - 1) &&
      w(len - 1) != 'w' && w(len - 1) != 'x' && w(len - 1) != 'y'

  private def endsWith(w: Array[Char], len: Int, s: String): Boolean = {
    val sl = s.length
    if (sl > len) return false
    var i = 0
    while (i < sl) {
      if (w(len - sl + i) != s.charAt(i)) return false
      i += 1
    }
    true
  }

  /** Steps 2-4 share the shape "first matching suffix wins; if its m
    * condition fails, the step ends without trying shorter suffixes"
    * (the reference implementation's per-ending switch). Returns the
    * new length. `minM` is the threshold (m > minM). */
  private def mapSuffix(w: Array[Char], len: Int,
      rules: Seq[(String, String)], minM: Int): Int = {
    rules.foreach { case (suf, rep) =>
      if (endsWith(w, len, suf)) {
        val base = len - suf.length
        if (measure(w, base) > minM) {
          var i = 0
          while (i < rep.length) { w(base + i) = rep.charAt(i); i += 1 }
          return base + rep.length
        }
        return len
      }
    }
    len
  }

  // longest-first within each step so overlapping endings (ization vs
  // ation, ational vs tional, ement vs ment vs ent) pick the longest —
  // equivalent to the paper's per-penultimate-letter switch
  private val step2Rules = Seq(
    "ational" -> "ate", "ization" -> "ize", "iveness" -> "ive",
    "fulness" -> "ful", "ousness" -> "ous", "tional" -> "tion",
    "biliti" -> "ble", "ousli" -> "ous", "entli" -> "ent",
    "alism" -> "al", "aliti" -> "al", "iviti" -> "ive",
    "ation" -> "ate", "enci" -> "ence", "anci" -> "ance",
    "izer" -> "ize", "abli" -> "able", "alli" -> "al",
    "ator" -> "ate", "eli" -> "e")

  private val step3Rules = Seq(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> "")

  private val step4Rules = Seq(
    "ement" -> "", "ance" -> "", "ence" -> "", "able" -> "",
    "ible" -> "", "ment" -> "", "ant" -> "", "ent" -> "", "ism" -> "",
    "ate" -> "", "iti" -> "", "ous" -> "", "ive" -> "", "ize" -> "",
    "ion" -> "", "al" -> "", "er" -> "", "ic" -> "", "ou" -> "")

  def stem(word: String): String = {
    if (word.length <= 2) return word
    val w = new Array[Char](word.length + 1) // +1: step 1b may append 'e'
    word.getChars(0, word.length, w, 0)
    var k = word.length

    // step 1a
    if (endsWith(w, k, "sses")) k -= 2
    else if (endsWith(w, k, "ies")) k -= 2
    else if (!endsWith(w, k, "ss") && endsWith(w, k, "s")) k -= 1

    // step 1b
    var restore = false
    if (endsWith(w, k, "eed")) {
      if (measure(w, k - 3) > 0) k -= 1
    } else if (endsWith(w, k, "ed") && containsVowel(w, k - 2)) {
      k -= 2; restore = true
    } else if (endsWith(w, k, "ing") && containsVowel(w, k - 3)) {
      k -= 3; restore = true
    }
    if (restore) {
      if (endsWith(w, k, "at") || endsWith(w, k, "bl") ||
          endsWith(w, k, "iz")) { w(k) = 'e'; k += 1 }
      else if (endsDoubleC(w, k) && w(k - 1) != 'l' && w(k - 1) != 's' &&
          w(k - 1) != 'z') k -= 1
      else if (measure(w, k) == 1 && cvc(w, k)) { w(k) = 'e'; k += 1 }
    }

    // step 1c
    if (endsWith(w, k, "y") && containsVowel(w, k - 1)) w(k - 1) = 'i'

    // steps 2-3: m > 0; step 4: m > 1 (ion additionally needs *s/*t)
    k = mapSuffix(w, k, step2Rules, 0)
    k = mapSuffix(w, k, step3Rules, 0)
    if (endsWith(w, k, "ion")) {
      val base = k - 3
      if (base >= 1 && (w(base - 1) == 's' || w(base - 1) == 't') &&
          measure(w, base) > 1) k = base
    } else k = mapSuffix(w, k, step4Rules.filterNot(_._1 == "ion"), 1)

    // step 5a
    if (endsWith(w, k, "e")) {
      val m = measure(w, k - 1)
      if (m > 1 || (m == 1 && !cvc(w, k - 1))) k -= 1
    }
    // step 5b
    if (endsDoubleC(w, k) && w(k - 1) == 'l' && measure(w, k) > 1) k -= 1

    new String(w, 0, k)
  }
}

/** porter_stem(text): the classic Porter stem of a lowercase token. */
case class PorterStem(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  /** Public for the generated code (r8 plan-reference call). */
  def kernel(input: UTF8String): UTF8String =
    UTF8String.fromString(PorterStemmer.stem(input.toString))
  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("stemExpr", this,
      classOf[PorterStem].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): PorterStem =
    copy(child = newChild)
  override def prettyName: String = "porter_stem"
}
