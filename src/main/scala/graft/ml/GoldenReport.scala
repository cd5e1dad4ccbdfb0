package graft.ml

import org.apache.spark.sql.DataFrame

/** K3/K4 — the loader's golden-report renderer
  * (`LDALoader.scala:111-212`, format per FIXTURES.md §A4), fed from
  * collected DataFrames instead of the reference's per-book driver loop:
  * the cluster computes everything (SURVEY.md §3.2 boundary note), the
  * driver only renders the final small rows.
  *
  * Byte-format fidelity notes: Java double rendering (`0.354215...`,
  * `8.44E-4`), tab/pipe column separators, `#`/`*`/`-` rule lines,
  * newline after every 3rd book in the per-topic list, trailing comma-
  * space after word lists — all as in the checked-in goldens
  * (`TestOutput/Result_EN_1591723228815`).
  */
object GoldenReport {

  private val hashRule = "#" * 87
  private val starRule = "*" * 87
  private val dashRule = "-" * 55

  final case class BookResult(
      number: Long, name: String, distribution: Seq[Double],
      mainTopic: Int, mainWeight: Double, topWords: Seq[String])

  final case class TopicSummary(
      topic: Int, terms: Seq[(String, Double)], books: Seq[String])

  def render(k: Int, books: Seq[BookResult], topics: Seq[TopicSummary]): String = {
    val sb = new StringBuilder
    sb.append(hashRule).append('\n')
    sb.append(s"LDA Model with $k topics\n")
    sb.append(hashRule).append('\n')
    books.foreach { b =>
      sb.append(starRule).append('\n')
      sb.append(s"Book's number: ${b.number}\n")
      sb.append(s"Book's name: ${b.name}\n\n")
      sb.append(dashRule).append('\n')
      sb.append("Topics Nr. \t|\t Distribution\n")
      sb.append(dashRule).append('\n')
      b.distribution.zipWithIndex.foreach { case (w, i) =>
        sb.append(s"Nr.: $i \t\t|\t $w\n")
      }
      sb.append(s"Main topic of the book: Topic Nr. (${b.mainTopic}), Weight (${b.mainWeight})\n")
      sb.append("Book most important words\n")
      sb.append(dashRule).append('\n')
      sb.append("Word. \t|\t TF\n")
      sb.append(dashRule).append('\n')
      sb.append(b.topWords.map(_ + ", ").mkString).append('\n')
      sb.append(starRule).append('\n')
      sb.append('\n')
    }
    sb.append(starRule).append('\n')
    topics.foreach { t =>
      sb.append('\n').append(dashRule).append('\n')
      sb.append(s"TOPIC ${t.topic}: top-weighted terms\n")
      sb.append(dashRule).append('\n')
      t.terms.foreach { case (term, w) => sb.append(s"$term\t$w\n") }
      sb.append('\n').append(dashRule).append('\n')
      sb.append(s"Amount of books in the topic: ${t.books.length}\n")
      sb.append(dashRule).append('\n')
      sb.append("List of Books.\n")
      sb.append(dashRule).append('\n')
      // newline after every 3rd book, ", " otherwise (LDALoader.scala:142-149)
      t.books.zipWithIndex.foreach { case (name, i) =>
        sb.append(name)
        if ((i + 1) % 3 == 0 || i == t.books.length - 1) sb.append(",\n")
        else sb.append(", ")
      }
      sb.append(dashRule).append('\n')
      sb.append('\n').append(starRule).append('\n')
    }
    sb.append('\n').append(hashRule).append('\n')
    sb.toString
  }

  /** Assemble the report from cluster-side results: one collect of small
    * final rows (assigned docs + topic summaries). */
  def fromDataFrames(k: Int, assigned: DataFrame, topics: DataFrame,
      nameCol: String = "book_name"): String = {
    val books = assigned
      .select("doc_id", nameCol, "topicDistribution", "main_topic")
      .collect()
      .sortBy(_.getLong(0))
      .map { r =>
        val dist = r.getAs[org.apache.spark.ml.linalg.Vector](2).toArray.toSeq
        val mt = r.getInt(3)
        BookResult(r.getLong(0), r.getString(1), dist, mt, dist(mt), Nil)
      }
    val topicRows = topics.collect().map { r =>
      TopicSummary(
        r.getInt(0),
        r.getSeq[String](1).zip(r.getSeq[Double](2)).toSeq,
        books.filter(_.mainTopic == r.getInt(0)).map(_.name).toSeq)
    }
    render(k, books.toSeq, topicRows.toSeq)
  }

  def write(path: String, content: String): Unit = {
    val pw = new java.io.PrintWriter(path)
    try pw.write(content) finally pw.close()
  }
}
