package graft.ml

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-preparation operators replicating the reference's cleaning
  * semantics (SURVEY.md §2.3) as declarative Spark expressions / UDFs.
  *
  * Quirks deliberately preserved:
  *  - P3 (`LDAClustering.scala:283-284`): the reference's special-char
  *    regex contains space–`-`–space sequences that form character
  *    ranges swallowing ALL of ASCII 0x20–0x2E, so `& * + , - .` are
  *    stripped while `= ~ < > /` and digits survive. We re-express that
  *    effective class directly (and verify equivalence property-based in
  *    TextPrepSpec).
  *  - P4 (`LDAClustering.scala:132-139`): stopwords match case-sensitively
  *    BEFORE stemming; no lowercasing anywhere; empty docs dropped.
  *  - P2 (`LDAClustering.scala:293-309`): lemmatization dedups repeated
  *    words within a sentence (the reference's `(words zip tags).toMap`)
  *    and drops lemmas of length ≤ 3 (replaced by "").
  */
object TextPrep {

  /** P3 — effective character class of the reference's
    * `replaceAll("[» « ! @ # $ % ^ & * ( ) _ + - − , ” " ’ ' ; : . ` ? --]", " ")`:
    * ASCII 0x20–0x2E (the accidental ranges + explicit members), plus
    * `; : ? ^ _ `` ` `` @ # $ %` and the unicode members `» « − ” ’`. */
  val specialCharClass: String = "[\\x20-\\x2E;:?@^_`»«−”’]"

  def filterSpecialCharacters(c: Column): Column =
    regexp_replace(c, specialCharClass, " ")

  /** P4 tokenizer — same shape as OpenNLP SimpleTokenizer: splits at
    * character-class transitions (letters / digits / other), whitespace
    * separates. `"don't"` → `don ' t` (the `'` is gone by then via P3). */
  val tokenPattern: String = "\\p{L}+|\\d+|[^\\p{L}\\d\\s]+"

  def simpleTokenize(c: Column): Column =
    regexp_extract_all(c, lit(tokenPattern), lit(0))

  /** Tokenize → case-sensitive stopword filter (pre-stem) → Porter stem,
    * as one column expression over a string column. Stopword list is a
    * literal array (reference lists are ~70 words; at larger scale this
    * becomes a broadcast join against an exploded token table). */
  def tokenizeFilterStem(text: Column, stopwords: Seq[String]): Column = {
    val toks = simpleTokenize(text)
    val stopArr = array(stopwords.map(lit): _*)
    // (the reference also checks length >= 1, but every tokenPattern
    // alternative matches ≥1 char, so the stopword test is the only
    // live predicate)
    val filtered = filter(toks, t => not(array_contains(stopArr, t)))
    transform(filtered, PorterStemmer.stemUdf(_))
  }

  /** P5 — reference stopword-file format: lines of comma-joined words
    * (`LDAClustering.scala:125-129`). */
  def parseStopwords(lines: Seq[String]): Seq[String] =
    lines.flatMap(_.stripMargin.split(","))

  /** P2 — lemmatization with the reference's structure: sentence split,
    * within-sentence word dedup, length>3 cut, trailing-space join —
    * PARAMETRIC in the lemma function. The dataflow around the
    * lemmatizer is the reference's; the lemmatizer itself is pluggable,
    * so a CoreNLP-equipped deployment passes `Morphology.lemma` here
    * and gets the reference's exact token stream, while this sandbox
    * (no CoreNLP dependency) uses [[heuristicLemma]]. TextPrepSpec's
    * fixture holds the dataflow byte-exact through an injected lookup
    * lemmatizer. */
  def lemmatizeText(text: String, lemma: String => String): String =
    if (text == null) "" else {
      val sb = new StringBuilder
      // sentence split on . ! ? (CoreNLP uses a trained splitter; this is
      // the deterministic stand-in)
      text.split("[.!?]+").foreach { sentence =>
        val words = sentence.split("\\s+").filter(_.nonEmpty)
        // reference: (words zip tags).toMap — keeps ONE entry per distinct
        // word within the sentence (last wins); iteration order was
        // HashMap-scrambled there, insertion-ordered here (bag-of-words
        // counts are unaffected except through the dedup itself)
        words.distinct.foreach { w =>
          val l = lemma(w)
          val added = if (l.length > 3) l else ""
          sb.append(added).append(' ')
        }
      }
      sb.toString
    }

  /** P2 as a column expression with an arbitrary lemma function. */
  def lemmatizeUdfWith(lemma: String => String) =
    udf { (text: String) => lemmatizeText(text, lemma) }

  val lemmatizeUdf = lemmatizeUdfWith(heuristicLemma)

  /** Deterministic stand-in for CoreNLP lemmatization: common English
    * inflection suffixes, longest-match first. */
  private[ml] def heuristicLemma(w: String): String = {
    val lw = w
    if (lw.length <= 3) lw
    else if (lw.endsWith("ies") && lw.length > 4) lw.dropRight(3) + "y"
    else if (lw.endsWith("sses")) lw.dropRight(2)
    else if (lw.endsWith("xes") || lw.endsWith("ches") || lw.endsWith("shes")) lw.dropRight(2)
    else if (lw.endsWith("ing") && lw.length > 5) {
      val stem = lw.dropRight(3)
      if (stem.length >= 2 && stem(stem.length - 1) == stem(stem.length - 2)) stem.dropRight(1)
      else stem
    }
    else if (lw.endsWith("ied")) lw.dropRight(3) + "y"
    else if (lw.endsWith("ed") && lw.length > 4) {
      val stem = lw.dropRight(2)
      if (stem.length >= 2 && stem(stem.length - 1) == stem(stem.length - 2)) stem.dropRight(1)
      else stem
    }
    else if (lw.endsWith("s") && !lw.endsWith("ss") && !lw.endsWith("us") && !lw.endsWith("is"))
      lw.dropRight(1)
    else lw
  }
}
