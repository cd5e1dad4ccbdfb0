package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end equivalents of the reference's two entry points
  * (`LDATraining.scala`, `LDALoader.scala`), batched cluster-side.
  */
object Pipeline {

  /** S6 — language → corpus subdirectory dispatch
    * (`LDALoader.scala:46-56`). */
  val languageDirs: Map[String, String] = Map(
    "DU" -> "Dutch", "EN" -> "English", "FR" -> "French", "GE" -> "German",
    "IT" -> "Italian", "RU" -> "Russian", "SP" -> "Spanish", "UKR" -> "Ukrainian")

  /** P6 — deterministic contiguous doc ids: row_number over a stable
    * order (the reference's zipWithIndex order was partition-dependent;
    * we pin by book name — SURVEY.md §2.3 P6). */
  def withDocIds(books: DataFrame, orderCol: String = "book_name"): DataFrame =
    books.withColumn("doc_id",
      row_number().over(Window.orderBy(col(orderCol))).cast("long") - 1)

  /** T4 — latest-model pick: explicit timestamp-suffix parse instead of
    * the reference's filesystem-order `.last` (`LDALoader.scala:25-37`,
    * SURVEY.md §7 risk 2). */
  def latestModel(dir: String, prefix: String = "LdaModel_"): Option[String] = {
    val files = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
    files.filter(f => f.isDirectory && f.getName.startsWith(prefix))
      .sortBy(f => f.getName.split("_").last.toLong)
      .lastOption.map(_.getPath)
  }

  /** The training entry point (`LDATraining` + `LDAClustering.run`):
    * books dir → prep → vectorize → LDA → save; returns fitted + report
    * strings (K4 console summary). */
  def trainOnBooks(
      spark: SparkSession,
      booksDir: String,
      stopwords: Seq[String],
      params: LdaPipeline.Params,
      saveDir: Option[String] = None): (LdaPipeline.Fitted, DataFrame) = {
    val books = withDocIds(CorpusReader.readBooks(spark, booksDir))
    val tokens = books.select(col("doc_id"), col("book_name"),
      TextPrep.tokenizeFilterStem(
        TextPrep.filterSpecialCharacters(TextPrep.lemmatizeUdf(col("text"))),
        stopwords).as("tokens"))
    val fitted = LdaPipeline.train(spark, tokens, params)
    saveDir.foreach(LdaPipeline.save(fitted, _))
    (fitted, LdaPipeline.describeTopics(spark, fitted, 10))
  }

  /** The loader entry point (`LDALoader`), batched: one DataFrame of all
    * books through the shared prep + model.transform, then the golden
    * report — the per-book driver loop of the reference collapsed into
    * one cluster job (SURVEY.md §3.2 boundary note). */
  def classifyBooks(
      spark: SparkSession,
      booksDir: String,
      stopwords: Seq[String],
      fitted: LdaPipeline.Fitted): (DataFrame, String) = {
    val books = withDocIds(CorpusReader.readBooks(spark, booksDir))
    val tokens = books.select(col("doc_id"), col("book_name"),
      TextPrep.tokenizeFilterStem(
        TextPrep.filterSpecialCharacters(TextPrep.lemmatizeUdf(col("text"))),
        stopwords).as("tokens"))
      .filter(size(col("tokens")) > 0)
    // P10 — local→global vocab projection: CountVectorizerModel with the
    // TRAINING vocab maps unseen terms to nothing (the reference's
    // indexOf == -1 drop, made total)
    val tf = Vectorize.countVectors(tokens, fitted.vocab)
    val idf = Vectorize.fitIdf(tf).idf.toArray
    val feat = Vectorize.tfidfWithFloor(spark, tf, idf)
    val assigned = LdaPipeline.assignTopics(fitted, feat)
    val topics = LdaPipeline.describeTopics(spark, fitted, 10)
    val report = GoldenReport.fromDataFrames(
      fitted.model.getK, assigned, topics)
    (assigned, report)
  }
}
