package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S1 — whole-file corpus ingestion: the reference's
  * `sc.wholeTextFiles(paths).map(_._2)` (`LDAClustering.scala:113`)
  * as a declarative scan that KEEPS the path (the loader needs book
  * names — SURVEY.md §2.3 P1 note).
  *
  * Scale notes: `wholetext` text scan yields one record per file — few
  * large records — so we repartition immediately to parallelize the
  * expensive per-document UDF chain (SURVEY.md §4). For >2 GB files or
  * binary payloads the `binaryFile` source is the fallback. The P9
  * comma→`?` substitution survives only as report-name escaping
  * (`LDALoader.scala:81` worked around wholeTextFiles' comma-separated
  * path lists; a declarative scan has no such problem).
  */
object CorpusReader {

  /** input_file_name() yields a percent-encoded URI. URLDecoder is the
    * wrong tool (it turns literal '+' into a space, corrupting names
    * like "C++ Guide.txt"); URI.getPath decodes only %XX escapes. */
  private val decodePath = udf { (p: String) =>
    try new java.net.URI(p).getPath
    catch { case _: java.net.URISyntaxException => p }
  }

  def readBooks(spark: SparkSession, dir: String): DataFrame = {
    val parallelism = spark.sparkContext.defaultParallelism
    spark.read
      .option("wholetext", "true")
      .text(dir)
      .withColumn("path", decodePath(input_file_name()))
      .withColumn("book_name",
        regexp_replace(element_at(split(col("path"), "/"), -1), ",", "?"))
      .select(col("path"), col("book_name"), col("value").as("text"))
      .repartition(parallelism)
  }

  /** S2/P5 — stopword file: single line of comma-joined words. */
  def readStopwords(spark: SparkSession, file: String): Seq[String] =
    TextPrep.parseStopwords(
      spark.read.textFile(file).collect().toSeq)
}
