package graft.ml

import graft.TestSpark
import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.clustering.LDA
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The ml.Pipeline composition of the reference dataflow: stages chain
  * lemma → char-filter → tokenize/stop/stem → TF·IDF-floor → LDA, and
  * the staged path produces the same features as the function path. */
class TransformersSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (0L, "The cats chased the dogs; dogs barked, cats purred quietly."),
    (1L, "Spark engines shuffle partitions across executors quickly."),
    (2L, "Dogs played near engines while cats watched executors."))
    .toDF("doc_id", "text")

  test("ml.Pipeline stages compose the reference dataflow") {
    val stop = Seq("the", "and", "while")
    val pipeline = new Pipeline().setStages(Array(
      new Lemmatizer().setInputCol("text").setOutputCol("lemmas"),
      new SpecialCharFilter().setInputCol("lemmas").setOutputCol("clean"),
      new TokenizeFilterStem().setInputCol("clean").setOutputCol("tokens")
        .setStopwords(stop),
      new TfIdfFloorVectorizer().setTokensCol("tokens").setOutputCol("features"),
      new LDA().setK(2).setMaxIter(5).setOptimizer("online").setSeed(3L)
        .setFeaturesCol("features")))
    val model = pipeline.fit(docs)
    val out = model.transform(docs)
    assert(out.columns.contains("topicDistribution"))
    assert(out.count() == 3)

    // staged features == function-path features
    val fnTokens = docs.select(col("doc_id"),
      TextPrep.tokenizeFilterStem(
        TextPrep.filterSpecialCharacters(TextPrep.lemmatizeUdf(col("text"))),
        stop).as("tokens"))
    val stagedTokens = model.stages(2).transform(
      model.stages(1).transform(model.stages(0).transform(docs)))
      .select("doc_id", "tokens")
    val a = fnTokens.orderBy("doc_id").collect().map(_.getSeq[String](1).toList).toList
    val b = stagedTokens.orderBy("doc_id").collect().map(_.getSeq[String](1).toList).toList
    assert(a == b)
  }

  test("TfIdfFloorModel keeps the zero-floor semantics") {
    val toks = docs.select(col("doc_id"),
      TextPrep.tokenizeFilterStem(col("text"), Seq("the")).as("tokens"))
    val model = new TfIdfFloorVectorizer().setTokensCol("tokens").fit(toks)
    assert(model.vocab.nonEmpty && model.idf.length == model.vocab.length)
    val feats = model.transform(toks)
    assert(feats.count() == 3)
    if (model.idf.contains(0.0)) {
      val zi = model.idf.indexWhere(_ == 0.0)
      val vals = feats.select("features").collect()
        .map(_.getAs[org.apache.spark.ml.linalg.Vector](0).toSparse)
        .flatMap(sv => sv.indices.zip(sv.values).filter(_._1 == zi).map(_._2))
      assert(vals.forall(v => v > 0 && v < 0.01))
    }
  }
}
