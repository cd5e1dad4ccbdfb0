package graft.ml

import org.apache.spark.ml.clustering.{DistributedLDAModel, LDA, LDAModel, LocalLDAModel}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LDA topic-clustering pipeline — the reference's core capability
  * (`LDAClustering.scala:20-96`, `LDALoader.scala:11-215`) re-expressed
  * on spark.ml.
  *
  * Parameter mapping (SURVEY.md §2.4 A6):
  *  - optimizer "em" | "online"; online gets the reference's minibatch
  *    robustness tweak `0.05 + 1/corpusSize` (`LDAClustering.scala:43`).
  *  - docConcentration/topicConcentration −1 → mllib auto
  *    (α = 50/k + 1, β = 1.1), same as the persisted reference models.
  *  - checkpointInterval 10 (EM lineage truncation).
  *  - the corpus fed to LDA is the TF·IDF-floored matrix, NOT integer
  *    counts — the reference's quirk (`LDAClustering.scala:23,61`).
  *  - a seed is always pinned (the reference never set one — SURVEY.md
  *    §7 risk 2 — which made its runs irreproducible; we fix that).
  *
  * Scale: EM builds a GraphX doc-term graph (memory ∝ corpus nonzeros —
  * the known ceiling); online is the 100 TB path (minibatched variational
  * updates, corpus never fully materialized per iteration). The loader-
  * side inference is cluster-wide `model.transform`, not the reference's
  * per-book driver loop (SURVEY.md §3.2 boundary note).
  */
object LdaPipeline {

  final case class Params(
      k: Int = 5,
      maxIterations: Int = 50,
      algorithm: String = "em",
      docConcentration: Double = -1,
      topicConcentration: Double = -1,
      vocabSize: Int = 2900000,
      checkpointInterval: Int = 10,
      seed: Long = 42L)

  final case class Fitted(
      model: LDAModel, vocab: Array[String], idf: Array[Double],
      corpus: DataFrame) {
    /** Drop the cached TF·IDF corpus. Call when done with a model in a
      * long-lived session (e.g. training all 8 language corpora) so
      * cached matrices don't accumulate in storage memory. */
    def release(): Unit = corpus.unpersist()
  }

  /** Full train: tokens DataFrame(doc_id, tokens) → fitted LDA + vocab.
    * Mirrors SURVEY.md §3.3's dataflow with Catalyst-planned stages. */
  def train(spark: SparkSession, tokens: DataFrame, params: Params): Fitted =
    trainWithPartitions(spark, tokens, params, None)

  /** [[train]] with an explicit corpus partition-count override — the
    * knob graft.tools.ProbeEmParts sweeps so the small-corpus coalesce
    * rule below is a measured curve, not one point. Production callers
    * use [[train]] (override None). */
  private[graft] def trainWithPartitions(
      spark: SparkSession, tokens: DataFrame, params: Params,
      partitionOverride: Option[Int]): Fitted = {
    // widened (guide §2.5): the TF·IDF prep (explode + count partial
    // aggs, count-vector build) otherwise fuses into the corpus scan
    // task — one task for a single-row-group corpus file. Counts and
    // vectors are exact per doc_id, so the prep result is
    // partition-independent; fit oracles are invariant-booleans.
    val widened = graft.Tables.widened(tokens, graft.Tables.DenseKernelFloor)
    val nonEmpty = widened.filter(size(col("tokens")) > 0) // P7
    val counts = Vectorize.wordCounts(nonEmpty)
    val vocab = Vectorize.buildVocab(counts, params.vocabSize)
    val tf = Vectorize.countVectors(nonEmpty, vocab)
    val corpusSize = tf.count()
    val idf = Vectorize.fitIdf(tf).idf.toArray
    // partition count tracks corpus size: EM-LDA runs one GraphX round
    // per iteration, and over-partitioning a small corpus turns the
    // training into pure scheduler overhead (measured 123 s → 74 s on
    // the reference EN corpus going 32 → 8 partitions). At real scale
    // the default parallelism stands.
    val scaled = Vectorize.tfidfWithFloor(spark, tf, idf)
    val online = params.algorithm.equalsIgnoreCase("online")
    // ONLINE partitioning tracks the MINIBATCH, not the corpus (r19,
    // guide §2.6 — fill the scheduler, don't flood it): each of the
    // ~2-3 jobs/iteration aggregates only the sampled minibatch
    // (≈ subsamplingRate × corpus ≈ 0.05·N docs), so per-job task
    // count is fixed cost multiplied by ~3×maxIter. Measured curve
    // (ProbeOnlineParts): 5k docs (≈250-doc minibatch) runs best at
    // 1 partition (8.9 → 6.0 s warm vs 8), 50k docs (≈2.5k minibatch)
    // at 8 (19.8 s at 2 parts — compute-bound — vs 11.3 at 8); ≈300
    // minibatch docs per task sits on both optima. Corpora ≥100k keep
    // the prep's own partitioning as before (at real scale the
    // minibatch is huge and default parallelism stands).
    val onlineParts =
      math.max(1L, math.min(corpusSize,
        math.ceil((0.05 * corpusSize + 1.0) / 300.0).toLong)).toInt
    val corpus = (partitionOverride match {
      case Some(p) => scaled.coalesce(p)
      case None if corpusSize < 100000 =>
        scaled.coalesce(if (online) onlineParts else 8)
      case None => scaled
    }).cache()

    // Checkpoint storage cost (r17 verdict #3): with a checkpoint dir
    // set (Bench/Verify/BookBench do — without one the interval is a
    // silent no-op, r16 verdict #3), EM writes the FULL doc-term graph
    // to the dir every `checkpointInterval` (10) iterations; ~5 copies
    // of the corpus graph per 50-iter fit. The runner mains register
    // the dir for deletion at JVM exit (TempDirs.deleteOnExit); a
    // production cluster should point it at scratch storage and clean
    // per job for the same reason.
    val lda = new LDA()
      .setK(params.k)
      .setMaxIter(params.maxIterations)
      .setFeaturesCol("features")
      .setCheckpointInterval(params.checkpointInterval)
      .setSeed(params.seed)
    if (params.docConcentration > 0) lda.setDocConcentration(params.docConcentration)
    if (params.topicConcentration > 0) lda.setTopicConcentration(params.topicConcentration)
    params.algorithm.toLowerCase match {
      case "em" => lda.setOptimizer("em")
      case "online" =>
        lda.setOptimizer("online")
          .setSubsamplingRate(math.min(1.0, 0.05 + 1.0 / corpusSize))
      case other =>
        throw new IllegalArgumentException(s"Only em, online are supported but got $other.")
    }
    if (params.algorithm.equalsIgnoreCase("online")) {
      // decomposing telemetry for online fits (r14 verdict #3): the
      // online optimizer submits a couple of short jobs per iteration
      // (sampled-minibatch aggregation + update), so the per-job wall
      // times of the fit decompose it into ~2×maxIter uniform samples
      // (EM records iterationTimes inside the model instead —
      // emIterationTimes below)
      val (model, times) = jobTimes(spark)(lda.fit(corpus))
      lastOnlineFitJobTimes = Some(times)
      Fitted(model, vocab, idf, corpus)
    } else Fitted(lda.fit(corpus), vocab, idf, corpus)
  }

  /** Per-job wall times of the most recent ONLINE fit (seconds, job
    * submission order; ~2 jobs per iteration) — ml06's analogue of
    * ml04's emIterationTimes, so a slow online-LDA sample in a driver
    * artifact decomposes into ~100 uniform per-job costs vs a few
    * stalled jobs (r14 verdict #3: ml06 ran 60.9 s cold in the r14
    * driver bench with nothing to attribute it to). Telemetry only —
    * never part of a query result. */
  @volatile var lastOnlineFitJobTimes: Option[Seq[Double]] = None

  /** Runs `f` and returns its result plus the wall time of every Spark
    * job submitted meanwhile, in job-id order. Durations come from the
    * scheduler's own event timestamps (SparkListenerJobStart/End.time),
    * so listener-bus lag cannot skew them; the bus is async, so after
    * `f` returns we poll briefly for quiescence instead of reaching
    * into the private listener-bus API. Bench runs queries serially, so
    * the captured jobs are the fit's own. */
  private def jobTimes[A](spark: SparkSession)(f: => A): (A, Seq[Double]) = {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
    val starts = scala.collection.concurrent.TrieMap.empty[Int, Long]
    val durs = scala.collection.concurrent.TrieMap.empty[Int, Double]
    val l = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts(j.jobId) = j.time
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach(t0 => durs(j.jobId) = (j.time - t0) / 1e3)
    }
    spark.sparkContext.addSparkListener(l)
    val r = try f finally {
      var last = -1
      var stable = 0
      var waited = 0
      while (stable < 2 && waited < 20) { // ≤1 s, usually ~100 ms
        Thread.sleep(50)
        waited += 1
        val n = durs.size
        if (n == last) stable += 1 else { stable = 0; last = n }
      }
      spark.sparkContext.removeSparkListener(l)
    }
    (r, durs.toSeq.sortBy(_._1).map(_._2))
  }

  /** Per-iteration EM training times (seconds) as recorded by the mllib
    * optimizer inside the fitted model — the decomposition that lets a
    * slow ml04 wall time be attributed to iterations × per-iteration
    * cost (a real plan regression) vs a loaded environment (uniform
    * inflation across iterations). Only the EM optimizer records these;
    * online fits return None. The mllib `iterationTimes` accessor is
    * public but reachable only through the ml wrapper's public
    * name-mangled bridge method — hence the reflective call (no
    * setAccessible, no private API crossed). */
  def emIterationTimes(fitted: Fitted): Option[Seq[Double]] = fitted.model match {
    case m: DistributedLDAModel =>
      try {
        val bridge = m.getClass.getMethod(
          "org$apache$spark$ml$clustering$DistributedLDAModel$$oldDistributedModel")
        val old = bridge.invoke(m)
        val times = old.getClass.getMethod("iterationTimes")
          .invoke(old).asInstanceOf[Array[Double]]
        Some(times.toIndexedSeq)
      } catch { case _: ReflectiveOperationException => None }
    case _ => None
  }

  /** A8 — topic descriptions with term indices resolved through the
    * vocabulary (broadcast lookup, not a driver loop). */
  def describeTopics(spark: SparkSession, fitted: Fitted, maxTermsPerTopic: Int): DataFrame = {
    val vocabB = spark.sparkContext.broadcast(fitted.vocab)
    val resolve = udf((idx: Seq[Int]) => idx.map(vocabB.value(_)))
    fitted.model.describeTopics(maxTermsPerTopic)
      .withColumn("terms", resolve(col("termIndices")))
      .select("topic", "terms", "termWeights")
  }

  /** A10 — argmax with the reference's last-wins tie-break
    * (`LDALoader.scala:131-140` uses `<=`, so the LAST maximal index
    * wins). */
  val argmaxLastWins = udf { (v: org.apache.spark.ml.linalg.Vector) =>
    var best = 0
    var bestW = Double.NegativeInfinity
    v.foreachActive { (i, w) =>
      if (w >= bestW) { best = i; bestW = w } // >= → last max wins
    }
    best
  }

  /** A9+A10 — cluster-side topic assignment for every document. */
  def assignTopics(fitted: Fitted, docs: DataFrame): DataFrame =
    fitted.model.transform(docs)
      .withColumn("main_topic", argmaxLastWins(col("topicDistribution")))

  /** A11 — books-per-topic histogram (the loader's driver arrays as one
    * hash aggregate). */
  def topicHistogram(assigned: DataFrame, nameCol: String): DataFrame =
    assigned
      .groupBy("main_topic")
      .agg(count(lit(1)).as("n_docs"), sort_array(collect_list(col(nameCol))).as("docs"))
      .orderBy("main_topic")

  /** K1/K2 — persistence: ml writer (JSON metadata + parquet, the same
    * layout family as the reference's `models/LdaModel_*`) + vocab text. */
  def save(fitted: Fitted, path: String): Unit = {
    fitted.model.write.overwrite().save(s"$path/model")
    val spark = fitted.corpus.sparkSession
    import spark.implicits._
    Seq(fitted.vocab.mkString(",")).toDF("vocab")
      .coalesce(1).write.mode("overwrite").text(s"$path/vocabulary")
  }

  /** S4/S5 — load a persisted model + vocabulary. */
  def load(spark: SparkSession, path: String, algorithm: String): (LDAModel, Array[String]) = {
    val model = algorithm.toLowerCase match {
      case "em" => DistributedLDAModel.load(s"$path/model")
      case _ => LocalLDAModel.load(s"$path/model")
    }
    val vocab = spark.read.text(s"$path/vocabulary")
      .head().getString(0).split(",")
    (model, vocab)
  }

  /** K1/K2 promoted to FULL staged persistence: the fitted
    * preprocessing (count vectorization over the fitted vocabulary +
    * the TF·IDF zero-floor) and the LDA model bundled as ONE spark.ml
    * `PipelineModel`. `save`/`load` above match the reference's
    * model+vocab contract; this closes the gap they leave — with only
    * model+vocab, a loader must re-wire the floor stage by hand, and a
    * mismatch there silently shifts every inference. The bundle wraps
    * the already-fitted stages (Pipeline.fit over Transformer-only
    * stages fits nothing — it validates schemas and packages), so
    * building it costs no training.
    *
    * The returned artifact re-transforms raw `(doc_id, tokens)` rows
    * end-to-end: tokens → tf → floored tf·idf → topicDistribution,
    * bit-identically to the in-memory `Fitted` chain
    * (StagedPersistenceSpec). */
  def stagedModel(fitted: Fitted, tokens: DataFrame): org.apache.spark.ml.PipelineModel = {
    val floor = new TfIdfFloorModel()
      .setVocab(fitted.vocab).setIdf(fitted.idf)
      .setTokensCol("tokens").setOutputCol("features")
    new org.apache.spark.ml.Pipeline()
      .setStages(Array(floor, fitted.model))
      .fit(tokens.select("doc_id", "tokens"))
  }

  def saveStaged(fitted: Fitted, tokens: DataFrame, path: String): Unit =
    stagedModel(fitted, tokens).write.overwrite().save(path)

  def loadStaged(spark: SparkSession, path: String): org.apache.spark.ml.PipelineModel =
    org.apache.spark.ml.PipelineModel.load(path)
}
