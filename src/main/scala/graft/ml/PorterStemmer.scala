package graft.ml

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Clean-room implementation of Porter's stemming algorithm (M.F. Porter,
  * "An algorithm for suffix stripping", Program 14(3), 1980 — public
  * algorithm). The reference stems via OpenNLP's PorterStemmer
  * (`LDAClustering.scala:137`), which implements the same algorithm.
  *
  * Used as a UDF inside the tokenize pipeline. A codegen'd Catalyst
  * Expression would avoid the UDF serialization overhead; at current
  * scale the UDF stays off the critical path (stemming is cheap next to
  * the shuffle), so the simpler form wins.
  */
object PorterStemmer {

  val stemUdf = udf((w: String) => if (w == null) null else stem(w))

  def stemCol(c: Column): Column = stemUdf(c)

  def stem(word: String): String = {
    if (word.length <= 2) return word
    var w = word
    w = step1a(w); w = step1b(w); w = step1c(w)
    w = step2(w); w = step3(w); w = step4(w); w = step5(w)
    w
  }

  private def isConsonant(w: String, i: Int): Boolean = w(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => false
    case 'y' => if (i == 0) true else !isConsonant(w, i - 1)
    case _ => true
  }

  /** Porter's measure m: number of VC sequences in the stem. */
  private def measure(w: String): Int = {
    var m = 0
    var i = 0
    val n = w.length
    while (i < n && isConsonant(w, i)) i += 1 // leading consonants
    while (i < n) {
      while (i < n && !isConsonant(w, i)) i += 1 // vowels
      if (i < n) { // consonant run after vowels → one VC
        m += 1
        while (i < n && isConsonant(w, i)) i += 1
      }
    }
    m
  }

  private def containsVowel(w: String): Boolean =
    w.indices.exists(i => !isConsonant(w, i))

  private def endsDoubleC(w: String): Boolean =
    w.length >= 2 && w(w.length - 1) == w(w.length - 2) && isConsonant(w, w.length - 1)

  /** *o — stem ends cvc where the final c is not w, x, or y. */
  private def endsCvc(w: String): Boolean =
    w.length >= 3 &&
      isConsonant(w, w.length - 3) && !isConsonant(w, w.length - 2) &&
      isConsonant(w, w.length - 1) &&
      !"wxy".contains(w(w.length - 1))

  private def replaceSuffix(w: String, suffix: String, repl: String, minM: Int): Option[String] =
    if (w.endsWith(suffix)) {
      val stem = w.dropRight(suffix.length)
      if (measure(stem) > minM) Some(stem + repl) else Some(w)
    } else None

  private def step1a(w: String): String =
    if (w.endsWith("sses")) w.dropRight(2)
    else if (w.endsWith("ies")) w.dropRight(2)
    else if (w.endsWith("ss")) w
    else if (w.endsWith("s")) w.dropRight(1)
    else w

  private def step1b(w: String): String = {
    if (w.endsWith("eed")) {
      if (measure(w.dropRight(3)) > 0) w.dropRight(1) else w
    } else {
      val stripped =
        if (w.endsWith("ed") && containsVowel(w.dropRight(2))) Some(w.dropRight(2))
        else if (w.endsWith("ing") && containsVowel(w.dropRight(3))) Some(w.dropRight(3))
        else None
      stripped match {
        case None => w
        case Some(s) =>
          if (s.endsWith("at") || s.endsWith("bl") || s.endsWith("iz")) s + "e"
          else if (endsDoubleC(s) && !"lsz".contains(s.last)) s.dropRight(1)
          else if (measure(s) == 1 && endsCvc(s)) s + "e"
          else s
      }
    }
  }

  private def step1c(w: String): String =
    if (w.endsWith("y") && containsVowel(w.dropRight(1))) w.dropRight(1) + "i" else w

  private val step2Rules = Seq(
    "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
    "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
    "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
    "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
    "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")

  private def step2(w: String): String =
    step2Rules.collectFirst {
      case (s, r) if w.endsWith(s) => replaceSuffix(w, s, r, 0).get
    }.getOrElse(w)

  private val step3Rules = Seq(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> "")

  private def step3(w: String): String =
    step3Rules.collectFirst {
      case (s, r) if w.endsWith(s) => replaceSuffix(w, s, r, 0).get
    }.getOrElse(w)

  private val step4Suffixes = Seq(
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize")

  private def step4(w: String): String = {
    // longest matching suffix wins (e.g. "ement" before "ment" before "ent")
    val matching = step4Suffixes.filter(w.endsWith).sortBy(-_.length)
    matching.headOption match {
      case Some("ion") =>
        val stem = w.dropRight(3)
        if (measure(stem) > 1 && stem.nonEmpty && "st".contains(stem.last)) stem else w
      case Some(s) =>
        val stem = w.dropRight(s.length)
        if (measure(stem) > 1) stem else w
      case None => w
    }
  }

  private def step5(w: String): String = {
    var r = w
    if (r.endsWith("e")) {
      val stem = r.dropRight(1)
      val m = measure(stem)
      if (m > 1 || (m == 1 && !endsCvc(stem))) r = stem
    }
    if (measure(r) > 1 && endsDoubleC(r) && r.endsWith("l")) r = r.dropRight(1)
    r
  }
}
