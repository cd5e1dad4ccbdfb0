package graft.operators

import graft.{QueryDef, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation operators: the selection/budgeting layer a
  * 100 TB pipeline runs AFTER cleaning (ta*) and dedup (dd*) to decide
  * what actually enters a training mix. Declared north-star extension;
  * no reference analogue.
  *
  *  - ta08/ta09 — per-document repetition and rule-based quality gates
  *    (the Gopher/C4 filter shape): pure narrow maps + per-doc aggs,
  *    embarrassingly parallel at scale.
  *  - sp01 — token-budget selection: keep the best documents until a
  *    token budget is spent. The global running sum uses the two-pass
  *    partition-offset scan (graft.GlobalCumsum), never a
  *    single-partition window.
  *  - sp02 — deterministic stratified sampling by md5 bucket: a
  *    stateless filter, the only sane shape at 100 TB (no shuffle, no
  *    coordination, reproducible lineage).
  *  - sp03 — mixture rebalancing: per-language token shares and the
  *    resampling weights that equalize them (low-cardinality agg).
  *  - dd08 — survivor selection over dd05's duplicate clusters: keep
  *    the highest-quality member per cluster (the step that turns
  *    cluster labels into an actual keep-list).
  *
  * The quality score is ta02's exact formula (oracle-proven
  * reproducible): 0.3·distinct_ratio + 0.4·min(nt/100, 1) +
  * 0.3·(1 − stop_ratio).
  */
object Curation {

  private val stop = "('the','a','of')"

  /** Shared quality CTE (mirrors ta02 — kept in lockstep by the green
    * oracles on both). */
  private[graft] val qualityCte =
    s"""q AS (
       |  SELECT doc_id, lang, CAST(len(string_split(text,' ')) AS BIGINT) AS nt,
       |    0.3e0 * ((len(list_distinct(string_split(text,' '))) * 1e0)
       |             / len(string_split(text,' ')))
       |    + 0.4e0 * least((len(string_split(text,' ')) * 1e0) / 100e0, 1e0)
       |    + 0.3e0 * (1e0 - (len(list_filter(string_split(text,' '), x -> x IN $stop)) * 1e0)
       |                     / len(string_split(text,' '))) AS quality
       |  FROM documents)""".stripMargin

  private[graft] def qualityDf(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), col("lang"),
        size(col("t")).cast("long").as("nt"),
        (lit(0.3) * (size(array_distinct(col("t"))) * lit(1.0) / size(col("t"))) +
          lit(0.4) * least(size(col("t")) * lit(1.0) / lit(100.0), lit(1.0)) +
          lit(0.3) * (lit(1.0) -
            expr(s"size(filter(t, x -> x IN $stop))") * lit(1.0) / size(col("t"))))
          .as("quality"))

  /** ta08 — within-document repetition profile (the "repeated n-gram"
    * quality signal): per-doc trigram total/distinct/max counts and the
    * derived ratios; is_repetitive flags docs whose single most common
    * trigram exceeds 5% of all trigrams. One explode + two hash aggs,
    * all map-side combinable. */
  val ta08 = QueryDef.sql("ta08_repetition_profile",
    """WITH toks AS (SELECT doc_id, string_split(text,' ') AS t FROM documents
      |              WHERE len(string_split(text,' ')) >= 3),
      |g AS (SELECT doc_id, UNNEST(list_transform(range(1, len(t)-1),
      |        i -> t[i]||' '||t[i+1]||' '||t[i+2])) AS s FROM toks),
      |c AS (SELECT doc_id, s, COUNT(*) AS c FROM g GROUP BY doc_id, s),
      |p AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_grams,
      |        COUNT(*) AS n_distinct, CAST(MAX(c) AS BIGINT) AS max_rep
      |      FROM c GROUP BY doc_id)
      |SELECT doc_id, n_grams, n_distinct, max_rep,
      |  (max_rep * 1e0) / n_grams AS top_gram_ratio,
      |  (n_distinct * 1e0) / n_grams AS distinct_gram_ratio,
      |  (max_rep * 1e0) / n_grams > 0.05e0 AS is_repetitive
      |FROM p
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val grams = T.widened(T.documents(s, d), T.DenseKernelFloor)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), explode(
        expr("transform(sequence(0, size(t)-3), i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))")).as("s"))
    grams
      .groupBy("doc_id", "s").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_grams"), count(lit(1)).as("n_distinct"),
        max("c").as("max_rep"))
      .select(col("doc_id"), col("n_grams"), col("n_distinct"), col("max_rep"),
        (col("max_rep") * lit(1.0) / col("n_grams")).as("top_gram_ratio"),
        (col("n_distinct") * lit(1.0) / col("n_grams")).as("distinct_gram_ratio"),
        (col("max_rep") * lit(1.0) / col("n_grams") > lit(0.05)).as("is_repetitive"))
      .orderBy("doc_id")
  }

  /** ta09 — rule-based quality gate (the C4/Gopher filter shape): one
    * boolean per rule — word-count bounds, mean-word-length bounds,
    * stopword presence, max single-token dominance — plus the combined
    * keep flag. Per-doc booleans make the filter auditable: a pipeline
    * reports WHY a document fell, not just that it fell. */
  val ta09 = QueryDef.sql("ta09_quality_rules",
    s"""WITH base AS (
       |  SELECT doc_id,
       |    len(string_split(text,' ')) AS nt,
       |    length(replace(text,' ','')) AS nonspace,
       |    len(list_filter(string_split(text,' '), x -> x IN $stop)) AS nstop
       |  FROM documents),
       |mt AS (SELECT doc_id, MAX(c) AS maxtok FROM (
       |  SELECT doc_id, term, COUNT(*) AS c FROM (
       |    SELECT doc_id, UNNEST(string_split(text,' ')) AS term FROM documents) u
       |  GROUP BY doc_id, term) g GROUP BY doc_id)
       |SELECT base.doc_id,
       |  base.nt BETWEEN 20 AND 100000 AS wc_ok,
       |  (base.nonspace * 1e0) / base.nt BETWEEN 2e0 AND 12e0 AS wlen_ok,
       |  base.nstop > 0 AS stop_ok,
       |  (mt.maxtok * 1e0) / base.nt <= 0.2e0 AS rep_ok,
       |  (base.nt BETWEEN 20 AND 100000)
       |    AND ((base.nonspace * 1e0) / base.nt BETWEEN 2e0 AND 12e0)
       |    AND (base.nstop > 0)
       |    AND ((mt.maxtok * 1e0) / base.nt <= 0.2e0) AS keep
       |FROM base JOIN mt ON mt.doc_id = base.doc_id
       |ORDER BY base.doc_id""".stripMargin) { (s, d) =>
    val docs = T.documents(s, d)
    val base = docs
      .select(col("doc_id"), split(col("text"), " ").as("t"), col("text"))
      .select(col("doc_id"),
        size(col("t")).as("nt"),
        length(translate(col("text"), " ", "")).as("nonspace"),
        expr(s"size(filter(t, x -> x IN $stop))").as("nstop"))
    val mt = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max("c").as("maxtok"))
    base.join(mt, "doc_id")
      .select(col("doc_id"),
        col("nt").between(20, 100000).as("wc_ok"),
        (col("nonspace") * lit(1.0) / col("nt")).between(2.0, 12.0).as("wlen_ok"),
        (col("nstop") > 0).as("stop_ok"),
        (col("maxtok") * lit(1.0) / col("nt") <= lit(0.2)).as("rep_ok"),
        (col("nt").between(20, 100000) &&
          (col("nonspace") * lit(1.0) / col("nt")).between(2.0, 12.0) &&
          col("nstop") > 0 &&
          col("maxtok") * lit(1.0) / col("nt") <= lit(0.2)).as("keep"))
      .orderBy("doc_id")
  }

  /** sp01 — token-budget selection: rank documents by quality (ties by
    * doc_id) and keep them while the running token total stays within
    * HALF the corpus's tokens. The budget predicate `2·cum <= total`
    * stays in exact integer arithmetic; the running sum is the two-pass
    * distributed scan (graft.GlobalCumsum), not a one-partition window.
    * This is how a pipeline spends a fixed token budget on the best
    * available data. */
  val sp01 = QueryDef.sql("sp01_token_budget",
    s"""WITH $qualityCte,
       |tot AS (SELECT SUM(nt) AS total FROM q),
       |r AS (SELECT doc_id, nt, quality,
       |        SUM(nt) OVER (ORDER BY quality DESC, doc_id
       |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |      FROM q)
       |SELECT doc_id, nt, quality, CAST(cum AS BIGINT) AS cum_tokens
       |FROM r, tot
       |WHERE 2 * cum <= tot.total
       |ORDER BY cum_tokens""".stripMargin) { (s, d) =>
    val q = qualityDf(s, d)
    val total = q.agg(sum("nt").as("total"))
    graft.GlobalCumsum
      .withRunningSum(q, Seq(col("quality").desc, col("doc_id")), "nt", "cum_tokens")
      .crossJoin(broadcast(total))
      .filter(col("cum_tokens") * 2 <= col("total"))
      .select("doc_id", "nt", "quality", "cum_tokens")
      .orderBy("cum_tokens")
  }

  /** sp02 — deterministic stratified sampling: per-language keep rates
    * applied via an md5 bucket of doc_id (dd06's split mechanism) — a
    * stateless, reproducible, shuffle-free filter. The bucket rides
    * along so the audit trail (why was this doc kept?) is in-band. */
  val sp02 = QueryDef.sql("sp02_stratified_sample",
    """SELECT doc_id, lang,
      |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS INTEGER) % 100 AS bucket
      |FROM documents
      |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS INTEGER) % 100
      |  < CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 40 WHEN 'es' THEN 30
      |              WHEN 'fr' THEN 20 ELSE 10 END
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 2), 16, 10)
      .cast("int") % 100
    val rate = expr(
      "CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 40 WHEN 'es' THEN 30 " +
        "WHEN 'fr' THEN 20 ELSE 10 END")
    T.documents(s, d)
      .withColumn("bucket", bucket)
      .filter(col("bucket") < rate)
      .select("doc_id", "lang", "bucket")
      .orderBy("doc_id")
  }

  /** sp03 — mixture rebalancing: per-language token totals, corpus
    * share, and the resampling weight min(tokens)/tokens that would
    * equalize the mix (weights ≤ 1 → downsampling; the common
    * "rebalance to the smallest stratum" rule). Exact integer totals;
    * one low-cardinality agg. */
  val sp03 = QueryDef.sql("sp03_mixture_weights",
    """WITH lt AS (
      |  SELECT lang, CAST(SUM(len(string_split(text,' '))) AS BIGINT) AS tokens
      |  FROM documents GROUP BY lang),
      |mn AS (SELECT MIN(tokens) AS m FROM lt),
      |tot AS (SELECT CAST(SUM(tokens) AS BIGINT) AS t FROM lt)
      |SELECT lang, tokens,
      |  (tokens * 1e0) / tot.t AS share,
      |  (mn.m * 1e0) / tokens AS resample_weight,
      |  mn.m AS target_tokens
      |FROM lt, mn, tot
      |ORDER BY lang""".stripMargin) { (s, d) =>
    val lt = T.documents(s, d)
      .withColumn("ntok", size(split(col("text"), " ")).cast("long"))
      .groupBy("lang").agg(sum("ntok").as("tokens"))
    val mn = lt.agg(min("tokens").as("m"))
    val tot = lt.agg(sum("tokens").as("t"))
    lt.crossJoin(broadcast(mn)).crossJoin(broadcast(tot))
      .select(col("lang"), col("tokens"),
        (col("tokens") * lit(1.0) / col("t")).as("share"),
        (col("m") * lit(1.0) / col("tokens")).as("resample_weight"),
        col("m").as("target_tokens"))
      .orderBy("lang")
  }

  /** dd08 — survivor selection: per duplicate cluster (dd05's connected
    * components), keep the highest-quality member (ties to the lowest
    * doc_id). The per-cluster window is partitioned by cluster_id —
    * cluster sizes are small by construction, so this scales. Reuses
    * the memoized cluster labels (Dedup.dupClusters). */
  val dd08 = QueryDef.sql("dd08_survivor_selection",
    s"""WITH clusters AS (SELECT * FROM (
       |${Dedup.dd05.oracle.get}
       |) z),
       |$qualityCte,
       |m AS (SELECT c.cluster_id, c.doc_id, q.quality,
       |        ROW_NUMBER() OVER (PARTITION BY c.cluster_id
       |                           ORDER BY q.quality DESC, c.doc_id) AS rk
       |      FROM clusters c JOIN q ON q.doc_id = c.doc_id),
       |sz AS (SELECT cluster_id, COUNT(*) AS n_members FROM clusters GROUP BY cluster_id)
       |SELECT m.cluster_id, m.doc_id AS survivor_id, m.quality AS survivor_quality,
       |  sz.n_members
       |FROM m JOIN sz ON sz.cluster_id = m.cluster_id
       |WHERE m.rk = 1
       |ORDER BY m.cluster_id""".stripMargin) { (s, d) =>
    val clusters = Dedup.dupClusters(s, d)
    val q = qualityDf(s, d).select(col("doc_id"), col("quality"))
    val w = Window.partitionBy("cluster_id")
      .orderBy(col("quality").desc, col("doc_id"))
    val sz = clusters.groupBy("cluster_id").agg(count(lit(1)).as("n_members"))
    clusters.join(q, "doc_id")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .join(sz, "cluster_id")
      .select(col("cluster_id"), col("doc_id").as("survivor_id"),
        col("quality").as("survivor_quality"), col("n_members"))
      .orderBy("cluster_id")
  }

  /** dd09 — benchmark decontamination: which training documents share a
    * LONG n-gram (8 tokens — the 8-13-gram overlap rule benchmark
    * decontamination actually uses; long grams make chance collisions
    * negligible) with a pinned evaluation subset (md5 bucket ≥ 95, ~5%).
    * Grams are 60-bit md5 fingerprints, so the overlap join moves
    * 8-byte keys and the identical hash runs in the oracle (collisions
    * shared).
    *
    * Scale shape — the asymmetry IS the design: the eval side is a
    * benchmark (tiny at 100 TB), so its gram set builds first and
    * BROADCASTS; the train side's grams stream through a map-side
    * broadcast join with NO corpus-wide shuffle — no global distinct,
    * no exchange keyed on gram. The only shuffle is the final per-doc
    * aggregate over matches (≈ contaminated rows only). The distinct
    * counts dedup inside the aggregate. */
  val dd09 = QueryDef.sql("dd09_benchmark_decontamination",
    """WITH docs AS (
      |  SELECT doc_id, string_split(text,' ') AS t,
      |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS INTEGER) % 100 AS b
      |  FROM documents WHERE len(string_split(text,' ')) >= 8),
      |g AS (SELECT doc_id, b,
      |        CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) AS h FROM (
      |  SELECT doc_id, b, UNNEST(list_transform(range(1, len(t)-6),
      |    i -> t[i]||' '||t[i+1]||' '||t[i+2]||' '||t[i+3]||' '||t[i+4]||' '||t[i+5]||' '||t[i+6]||' '||t[i+7])) AS s
      |  FROM docs) u),
      |ev AS (SELECT doc_id AS eval_doc, h FROM g WHERE b >= 95),
      |tr AS (SELECT doc_id, h FROM g WHERE b < 95)
      |SELECT tr.doc_id AS train_doc,
      |  COUNT(DISTINCT tr.h) AS n_shared_grams,
      |  COUNT(DISTINCT ev.eval_doc) AS n_eval_docs
      |FROM tr JOIN ev ON tr.h = ev.h
      |GROUP BY tr.doc_id
      |ORDER BY n_shared_grams DESC, train_doc""".stripMargin) { (s, d) =>
    // fused kernel (r9): per-doc DISTINCT 8-gram fingerprints in one
    // codegen pass — no interpreted transform(...) lambda per gram, no
    // gram STRINGS exploded into rows, and the per-side (doc_id, h)
    // dedup happens in-map, which also minimizes the decontamination
    // join's fanout (duplicate grams within a doc would multiply
    // matches; both countDistinct outputs are unchanged by the dedup)
    graft.functions.ShingleHashes.register(s)
    val withB = bucketed(T.documents(s, d))
    val ev = gram8(T.widened(withB.filter(col("b") >= 95), T.DenseKernelFloor))
      .withColumnRenamed("doc_id", "eval_doc")
    val tr = gram8(T.widened(withB.filter(col("b") < 95), T.DenseKernelFloor))
    tr.join(broadcast(ev), "h")
      .groupBy(col("doc_id").as("train_doc"))
      .agg(countDistinct("h").as("n_shared_grams"),
        countDistinct("eval_doc").as("n_eval_docs"))
      .orderBy(col("n_shared_grams").desc, col("train_doc"))
  }

  /** The dd09/dd18 eval-split bucket: md5 of the doc id, bucket ≥ 95
    * (~5%) plays the pinned benchmark eval set. */
  private def bucketed(docs: DataFrame): DataFrame =
    docs.withColumn("b",
      conv(substring(md5(col("doc_id").cast("string")), 1, 2), 16, 10)
        .cast("int") % 100)

  /** Per-doc DISTINCT 8-gram fingerprints via the fused codegen kernel
    * (shared by dd09 and dd18 — one gram convention, so the standing
    * index dd18 probes is definitionally the one dd09 builds). */
  private def gram8(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"), expr("shingle_hashes(text, 8)").as("hs"))
    .filter(size(col("hs")) > 0)
    .selectExpr("doc_id", "hs", "explode(sequence(0, size(hs) - 1)) AS i")
    .selectExpr("doc_id", "hs[CAST(i AS INT)] AS h")

  /** dd18 — incremental decontamination (r16 verdict optional #7, the
    * dd16 discipline on dd09's check): dd09 decontaminates the WHOLE
    * training corpus against the benchmark in one batch; a production
    * pipeline runs the check per crawl delta — the day's batch
    * (doc_id % 5 = 0 among train docs) is signed map-only and probed
    * against the STANDING eval-set 8-gram index, which at 100 TB is
    * maintained state (built once per benchmark release, ~KBs of 8-byte
    * fingerprints — it BROADCASTS by construction). This closes the
    * batch/incremental lifecycle cell for decontamination that dd16
    * (MinHash band index), ss15 (IVFPQ index), and mm07 (perceptual)
    * close for their families.
    *
    * Scale shape: the corpus is NEVER rescanned — the delta's grams are
    * a narrow map (admission batch: not widened, no pre-join shuffle —
    * the st14/dd16 property), the eval index build is the compute-dense
    * side (widened; standing state in production), both joins broadcast
    * (gram probe: eval index; spine attach: contaminated rows only —
    * hits ⊆ delta and contamination is rare by design), and the only
    * exchange is the per-doc aggregate over matches. NO stop-gram
    * prune, deliberately: decontamination is recall-critical — a hot
    * gram is exactly the contamination evidence the check exists for
    * (the dd16 boilerplate rationale does not transfer).
    *
    * Unlike dd09's contaminated-only output, dd18 emits ONE ROW PER
    * DELTA DOC — the admission ledger (dd16's contract): shared-gram /
    * eval-doc counts and the admitted bit (zero shared grams). Docs
    * with < 8 tokens carry no evidence and are admitted. Grams are the
    * same 60-bit md5 fingerprints, so DuckDB re-derives every decision
    * bit-exactly. */
  val dd18 = QueryDef.sql("dd18_decontamination_delta",
    """WITH docs AS (
      |  SELECT doc_id, string_split(text,' ') AS t,
      |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS INTEGER) % 100 AS b
      |  FROM documents WHERE len(string_split(text,' ')) >= 8),
      |g AS (SELECT doc_id, b,
      |        CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) AS h FROM (
      |  SELECT doc_id, b, UNNEST(list_transform(range(1, len(t)-6),
      |    i -> t[i]||' '||t[i+1]||' '||t[i+2]||' '||t[i+3]||' '||t[i+4]||' '||t[i+5]||' '||t[i+6]||' '||t[i+7])) AS s
      |  FROM docs) u),
      |ev AS (SELECT doc_id AS eval_doc, h FROM g WHERE b >= 95),
      |delta AS (SELECT doc_id, h FROM g WHERE b < 95 AND doc_id % 5 = 0),
      |hits AS (SELECT delta.doc_id,
      |           COUNT(DISTINCT delta.h) AS nsh,
      |           COUNT(DISTINCT ev.eval_doc) AS ned
      |         FROM delta JOIN ev ON delta.h = ev.h
      |         GROUP BY delta.doc_id),
      |ids AS (SELECT doc_id FROM documents
      |        WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS INTEGER) % 100 < 95
      |          AND doc_id % 5 = 0)
      |SELECT ids.doc_id AS doc_id,
      |  CAST(COALESCE(hits.nsh, 0) AS BIGINT) AS n_shared_grams,
      |  CAST(COALESCE(hits.ned, 0) AS BIGINT) AS n_eval_docs,
      |  (COALESCE(hits.nsh, 0) = 0) AS admitted
      |FROM ids LEFT JOIN hits ON ids.doc_id = hits.doc_id
      |ORDER BY ids.doc_id""".stripMargin) { (s, d) =>
    // decisions memoized per (application, dir) — the dd16 rationale:
    // one small cached ledger per dir instead of a fresh storage entry
    // per bench rep. synchronized + LRU-1 eviction via MemoLru (r17
    // verdict #6 / ADVICE #2 — the sharedParts/st19 discipline): a
    // concurrent double-build would leak the losing build's cached
    // ledger, and a new dir for the same app unpersists the previous
    // dir's frame.
    graft.MemoLru.getOrBuild(dd18Cache, s.sparkContext.applicationId, d)(
      _.unpersist())(decontaminationDelta(s, T.documents(s, d)))
  }

  private val dd18Cache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  /** dd18's dataflow over an arbitrary (doc_id, text) frame — factored
    * (the incrementalBandIndex precedent) so the spec can plant a
    * contaminated delta doc (verbatim eval 8-gram), a clean doc, and a
    * short (< 8 tokens, evidence-free) doc. */
  private[graft] def decontaminationDelta(
      s: SparkSession, docs: DataFrame): DataFrame = {
    // materialize-and-release (the incrementalBandIndex pattern): the
    // ledger is one small row per delta doc
    val out = decontaminationDeltaChain(s, docs).cache()
    out.count()
    out
  }

  /** The LAZY dataflow of dd18, factored (the admittedCuration
    * precedent) so PlanShapeSpec can lock its physical shape on an
    * unmaterialized frame. */
  private[graft] def decontaminationDeltaChain(
      s: SparkSession, docs: DataFrame): DataFrame = {
    graft.functions.ShingleHashes.register(s)
    val withB = bucketed(docs)
    // standing eval index: compute-dense build, widened (in production
    // this is maintained state keyed by the benchmark release)
    val ev = gram8(T.widened(withB.filter(col("b") >= 95), T.DenseKernelFloor))
      .withColumnRenamed("doc_id", "eval_doc")
    // the day's delta: map-only grams, NOT widened, no pre-join shuffle
    val delta = gram8(withB.filter(col("b") < 95 && col("doc_id") % 5 === 0))
    val hits = delta.join(broadcast(ev), "h")
      .groupBy("doc_id")
      .agg(countDistinct("h").as("nsh"), countDistinct("eval_doc").as("ned"))
    val spine = withB.filter(col("b") < 95 && col("doc_id") % 5 === 0)
      .select("doc_id")
    spine.join(broadcast(hits), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("nsh"), lit(0L)).as("n_shared_grams"),
        coalesce(col("ned"), lit(0L)).as("n_eval_docs"))
      .withColumn("admitted", col("n_shared_grams") === 0L)
      .orderBy("doc_id")
  }

  /** ta10 — ranked retrieval: BM25-shaped scoring of every document for
    * a fixed query-term set (k1=1.2, b=0.75), top-50. The idf factor is
    * the RATIONAL surrogate (N−df+0.5)/(df+0.5) rather than its ln —
    * same ranking direction, but ln's last-ulp varies across libm
    * implementations and would break cross-engine hash parity (tf04
    * precedent). One tf aggregate, a 3-row df/doc-length broadcast, one
    * top-k — the shape of a distributed first-stage retriever. */
  val ta10 = QueryDef.sql("ta10_bm25_retrieval",
    """WITH qt AS (SELECT UNNEST(['spark', 'join', 'sort']) AS term),
      |tok AS (SELECT doc_id, UNNEST(string_split(text,' ')) AS term FROM documents),
      |dl AS (SELECT doc_id, CAST(len(string_split(text,' ')) AS BIGINT) AS dl FROM documents),
      |stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |            (SELECT (SUM(dl) * 1e0) / COUNT(*) FROM dl) AS avgdl
      |          FROM documents),
      |tf AS (SELECT tok.doc_id, tok.term, COUNT(*) AS tf
      |       FROM tok JOIN qt ON qt.term = tok.term GROUP BY tok.doc_id, tok.term),
      |dfr AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM tf GROUP BY term),
      |persc AS (
      |  SELECT tf.doc_id, tf.term,
      |    ((stats.n - dfr.df + 0.5e0) / (dfr.df + 0.5e0))
      |      * (tf.tf * 1e0)
      |      / (tf.tf + 1.2e0 * (1e0 - 0.75e0 + 0.75e0 * (dl.dl / stats.avgdl))) AS sc
      |  FROM tf JOIN dfr ON dfr.term = tf.term
      |          JOIN dl ON dl.doc_id = tf.doc_id
      |          CROSS JOIN stats),
      |scored AS (
      |  SELECT doc_id,
      |    MAX(CASE WHEN term = 'join' THEN sc END) AS s_join,
      |    MAX(CASE WHEN term = 'sort' THEN sc END) AS s_sort,
      |    MAX(CASE WHEN term = 'spark' THEN sc END) AS s_spark
      |  FROM persc GROUP BY doc_id)
      |SELECT doc_id,
      |  COALESCE(s_join, 0e0) + COALESCE(s_sort, 0e0) + COALESCE(s_spark, 0e0) AS score
      |FROM scored
      |ORDER BY score DESC, doc_id
      |LIMIT 50""".stripMargin) { (s, d) =>
    val docs = T.documents(s, d)
    val qt = Seq("spark", "join", "sort")
    val tok = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term").isin(qt: _*))
    val dl = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("dl"))
    val stats = docs.agg(count(lit(1)).as("n"))
      .crossJoin(dl.agg((sum("dl") * lit(1.0) / count(lit(1))).as("avgdl")))
    val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfr = tf.groupBy("term").agg(countDistinct("doc_id").as("df"))
    // per-(doc, term) score is a single row, so the per-term pivot MAX
    // is exact and the 3-term total adds in ONE fixed expression order —
    // a floating SUM over an engine-chosen row order would differ in
    // the last ulp between engines
    val sc = ((col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
      (col("tf") * lit(1.0)) /
      (col("tf") + lit(1.2) * (lit(1.0) - lit(0.75) +
        lit(0.75) * (col("dl") / col("avgdl"))))
    tf.join(broadcast(dfr), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("term"), sc.as("sc"))
      .groupBy("doc_id")
      .agg(
        max(when(col("term") === "join", col("sc"))).as("s_join"),
        max(when(col("term") === "sort", col("sc"))).as("s_sort"),
        max(when(col("term") === "spark", col("sc"))).as("s_spark"))
      .select(col("doc_id"),
        (coalesce(col("s_join"), lit(0.0)) + coalesce(col("s_sort"), lit(0.0)) +
          coalesce(col("s_spark"), lit(0.0))).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(50)
  }

  /** sp04 — per-stratum top-k: the k best documents per language by
    * quality, via the native TopKIds aggregate (TypedImperativeAggregate
    * — map-side partial top-k, at most k candidates per stratum enter
    * the shuffle) instead of a per-stratum window sort. The selection
    * step a curation pipeline runs when each stratum keeps a fixed doc
    * count rather than a token budget (sp01's dual). */
  val sp04 = QueryDef.sql("sp04_per_stratum_topk",
    s"""WITH $qualityCte
       |SELECT lang,
       |  array_to_string((list(doc_id ORDER BY quality DESC, doc_id))[1:5], ',') AS top_docs
       |FROM q
       |GROUP BY lang
       |ORDER BY lang""".stripMargin) { (s, d) =>
    graft.functions.TopKIds.register(s)
    qualityDf(s, d)
      .groupBy("lang")
      .agg(array_join(
        expr("top_k_ids(quality, doc_id, 5)").cast("array<string>"), ",")
        .as("top_docs"))
      .orderBy("lang")
  }

  /** sp05 — fixed-size document chunking with overlap: the step that
    * turns curated documents into training-window-sized pieces (32
    * tokens per chunk, stride 24 → 8-token overlap between
    * neighbors). Chunk boundaries are a pure per-row function of the
    * token count — sequence + explode + slice, no shuffle at all
    * until the output sort, and at 100 TB none: chunking is a map.
    * The oracle re-derives every boundary, chunk length, and the
    * first/last token of each chunk, so an off-by-one in stride or
    * slice indexing (0- vs 1-based — Spark slice and DuckDB t[a:b]
    * are BOTH 1-based, but sequence/range are 0-based) goes red
    * rather than silently truncating training data. Projected to
    * doc_id < 50 to bound output rows. */
  val sp05 = QueryDef.sql("sp05_doc_chunking",
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
      |  WHERE doc_id < 50),
      |ch AS (
      |  SELECT doc_id, t,
      |    UNNEST(range(0, CAST(ceil(len(t) / 24.0) AS BIGINT))) AS chunk_id
      |  FROM toks)
      |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
      |  CAST(len(t[chunk_id*24+1 : chunk_id*24+32]) AS BIGINT) AS n_tok,
      |  t[chunk_id*24+1] AS first_tok,
      |  t[CAST(least(chunk_id*24+32, len(t)) AS BIGINT)] AS last_tok
      |FROM ch
      |ORDER BY doc_id, chunk_id""".stripMargin) { (s, d) =>
    T.documents(s, d)
      .filter(col("doc_id") < 50)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .withColumn("chunk_id",
        explode(sequence(lit(0L), ceil(size(col("t")) / 24.0).cast("long") - 1)))
      .select(
        col("doc_id"), col("chunk_id"),
        size(expr("slice(t, chunk_id*24+1, 32)")).cast("long").as("n_tok"),
        element_at(col("t"), (col("chunk_id") * 24 + 1).cast("int"))
          .as("first_tok"),
        element_at(col("t"),
          least(col("chunk_id") * 24 + 32, size(col("t")).cast("long")).cast("int"))
          .as("last_tok"))
      .orderBy("doc_id", "chunk_id")
  }

  /** sp06 — concat-and-chunk sequence packing: the LM-pretraining step
    * that concatenates the corpus in a deterministic order and slices
    * it into fixed context windows (2048 tokens/bin here). A document's
    * bin span is a pure function of its running token offset — computed
    * with the two-pass distributed prefix sum (graft.GlobalCumsum), so
    * there is no single-partition window anywhere; the per-doc
    * bin-range explode has fanout ≈ doc_tokens/2048 (usually 1), and
    * the per-bin aggregate is a map-side-combinable hash agg on a
    * dense integer key. Everything stays in exact int64 arithmetic.
    * Reports, per bin: docs overlapping, docs starting, fill tokens
    * (== 2048 except the final partial bin — the padding/waste audit),
    * and the doc-id range packed into it. */
  val sp06 = QueryDef.sql("sp06_sequence_packing",
    """WITH nt AS (
      |  SELECT doc_id, CAST(len(string_split(text,' ')) AS BIGINT) AS nt
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, nt,
      |    CAST(SUM(nt) OVER (ORDER BY doc_id
      |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |         AS BIGINT) AS cum
      |  FROM nt),
      |e AS (
      |  SELECT doc_id, nt, cum, cum - nt AS st,
      |    UNNEST(range((cum - nt) // 2048, (cum - 1) // 2048 + 1)) AS bin
      |  FROM c)
      |SELECT CAST(bin AS BIGINT) AS bin_id,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN st // 2048 = bin THEN 1 ELSE 0 END) AS BIGINT) AS docs_starting,
      |  CAST(SUM(least(cum, (bin+1)*2048) - greatest(st, bin*2048)) AS BIGINT) AS fill_tokens,
      |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      |FROM e GROUP BY bin
      |ORDER BY bin_id""".stripMargin) { (s, d) =>
    val nt = T.documents(s, d)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("nt"))
    graft.GlobalCumsum.withRunningSum(nt, Seq(col("doc_id")), "nt", "cum")
      .withColumn("st", col("cum") - col("nt"))
      .withColumn("bin",
        explode(expr("sequence(st div 2048, (cum - 1) div 2048)")))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(expr("st div 2048") === col("bin"), 1).otherwise(0))
          .cast("long").as("docs_starting"),
        sum(least(col("cum"), (col("bin") + 1) * 2048) -
          greatest(col("st"), col("bin") * 2048)).cast("long").as("fill_tokens"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .select(col("bin").cast("long").as("bin_id"), col("n_docs"),
        col("docs_starting"), col("fill_tokens"), col("first_doc"), col("last_doc"))
      .orderBy("bin_id")
  }

  /** sp07 — seeded deterministic global shuffle + shard assignment: the
    * epoch-reshuffle step of a training run. The permutation is a pure
    * function of (seed, doc_id) — order by md5("epoch7|" || doc_id) —
    * so it is reproducible from lineage alone, needs no RNG state, and
    * a different seed string gives an independent permutation. The
    * global position comes from graft.GlobalIndex (distributed range
    * sort + zipWithIndex), never a single-partition window; the shard
    * is pos % 8, so shard sizes are balanced to ±1 by construction.
    * At 100 TB this is exactly one range-sort shuffle keyed on an
    * 8-byte hash prefix, and the writer can partitionBy(shard). */
  val sp07 = QueryDef.sql("sp07_deterministic_shuffle",
    """WITH r AS (
      |  SELECT doc_id,
      |    ROW_NUMBER() OVER (ORDER BY md5('epoch7|' || CAST(doc_id AS VARCHAR)), doc_id)
      |      - 1 AS pos
      |  FROM documents)
      |SELECT doc_id, CAST(pos AS BIGINT) AS pos,
      |  CAST(pos % 8 AS BIGINT) AS shard
      |FROM r ORDER BY pos""".stripMargin) { (s, d) =>
    val keyed = T.documents(s, d)
      .select(col("doc_id"),
        md5(concat(lit("epoch7|"), col("doc_id").cast("string"))).as("k"))
    graft.GlobalIndex.withGlobalIndex(keyed, Seq(col("k"), col("doc_id")), "pos")
      .select(col("doc_id"), col("pos"), (col("pos") % 8).as("shard"))
      .orderBy("pos")
  }

  /** sp08 — importance resampling: keep each document with probability
    * proportional to a weight (here length-proportional, capped at 800
    * chars), decided by comparing a uniform hash draw against the
    * weight. Both sides of the accept test stay in EXACT int64
    * arithmetic — u·800 < w·2^32 with u = first 8 md5 hex digits — so
    * the keep set is bit-reproducible across engines and partitionings
    * (no float RNG anywhere). The expected keep fraction is audited
    * next to the realized one: sums run over exact bigints and the two
    * divisions happen once per output row. Stateless filter + one
    * low-cardinality agg — the 100 TB shape (no shuffle before the
    * final 25-group agg). */
  val sp08 = QueryDef.sql("sp08_importance_resampling",
    """WITH w AS (
      |  SELECT lang, source, least(n_chars, 800) AS w,
      |    CAST(('0x' || substr(md5('rs1|' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS u
      |  FROM documents)
      |SELECT lang, source, COUNT(*) AS n_total,
      |  CAST(SUM(CASE WHEN u * 800 < w * 4294967296 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(SUM(CASE WHEN u * 800 < w * 4294967296 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / COUNT(*) AS kept_frac,
      |  CAST(SUM(w) AS DOUBLE) / (800e0 * COUNT(*)) AS expected_frac
      |FROM w GROUP BY lang, source
      |ORDER BY lang, source""".stripMargin) { (s, d) =>
    val w = T.documents(s, d)
      .select(col("lang"), col("source"),
        least(col("n_chars"), lit(800L)).as("w"),
        conv(substring(md5(concat(lit("rs1|"), col("doc_id").cast("string"))), 1, 8),
          16, 10).cast("long").as("u"))
    val kept = (col("u") * 800L < col("w") * 4294967296L).cast("long")
    w.groupBy("lang", "source")
      .agg(count(lit(1)).as("n_total"),
        sum(kept).as("n_kept"),
        (sum(kept).cast("double") / count(lit(1))).as("kept_frac"),
        (sum(col("w")).cast("double") / (lit(800.0) * count(lit(1))))
          .as("expected_frac"))
      .orderBy("lang", "source")
  }

  /** sp09 — the END-TO-END curation pipeline: rule gate (ta09's C4/
    * Gopher booleans) → exact dedup within the gated set (dd01's
    * min-doc_id survivor per content hash) → token-budget selection
    * (sp01's half-budget greedy over quality order, GlobalCumsum) →
    * sequence packing (sp06's 2048-token bins, GlobalCumsum again).
    * The point is COMPOSITION: every stage is an already-oracled
    * component, and this query proves they compose into one lazy DAG —
    * one documents scan feeds the whole chain, the two running sums
    * are distributed two-pass scans (zero single-partition windows),
    * and the only driver-side value is the 1-row token total. The
    * oracle embeds ta09's rule SQL verbatim (the ss03/mm03 pattern) and
    * re-derives every stage, so a semantic drift in ANY stage — gate,
    * survivor choice, budget boundary, bin arithmetic — is a hash
    * miss here even if the stage's own query stays green. At 100 TB
    * this is the actual shape of a pretraining-data build: narrow maps
    * + one content-hash shuffle + two prefix-sum passes + one dense-key
    * agg. */
  /** The shared budget + packing tail of the pipeline queries (sp09 /
    * sp11 / mm-side sp12): half-token-budget selection over (quality
    * DESC, doc_id) order, then 2048-token sequence packing — both
    * running sums via the GlobalCumsum two-pass scan, never a
    * one-partition window. `src` must expose (doc_id, nt, quality). */
  private[graft] def budgetPack(adm: DataFrame): DataFrame = {
    // the token total is the LAST running-sum value, so read it from
    // the (localCheckpoint-ed) prefix-sum output instead of a separate
    // SUM over `adm` — the admission chain upstream is evaluated ONCE
    // per query, not twice (r16; at sf0.1 this halved sp12's cold wall,
    // and at 100 TB it is one fewer full pass over the gated corpus).
    // Exact-integer equal to the oracle's SUM(nt): cum is a total-order
    // running sum of nt over every admitted row.
    val withCum = graft.GlobalCumsum
      .withRunningSum(adm, Seq(col("quality").desc, col("doc_id")), "nt", "cum")
    val total = withCum.agg(max("cum").as("total"))
    val cho = withCum
      .crossJoin(broadcast(total))
      .filter(col("cum") * 2 <= col("total"))
      .select("doc_id", "nt")
    graft.GlobalCumsum.withRunningSum(cho, Seq(col("doc_id")), "nt", "cum")
      .withColumn("st", col("cum") - col("nt"))
      .withColumn("bin",
        explode(expr("sequence(st div 2048, (cum - 1) div 2048)")))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(expr("st div 2048") === col("bin"), 1).otherwise(0))
          .cast("long").as("docs_starting"),
        sum(least(col("cum"), (col("bin") + 1) * 2048) -
          greatest(col("st"), col("bin") * 2048)).cast("long").as("fill_tokens"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .select(col("bin").cast("long").as("bin_id"), col("n_docs"),
        col("docs_starting"), col("fill_tokens"), col("first_doc"), col("last_doc"))
      .orderBy("bin_id")
  }

  /** [[budgetPack]]'s DuckDB mirror — the tail CTEs from the token
    * total to the packed-bin rollup, over any (doc_id, nt, quality)
    * CTE named `src`. ONE string shared by the sp09/sp11/sp12 oracles
    * so the three mirrors cannot drift. */
  private[graft] def budgetPackSql(src: String): String =
    s"""tot AS (SELECT SUM(nt) AS total FROM $src),
       |sel AS (SELECT doc_id, nt,
       |          SUM(nt) OVER (ORDER BY quality DESC, doc_id
       |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |        FROM $src),
       |cho AS (SELECT doc_id, nt FROM sel, tot WHERE 2 * cum <= tot.total),
       |c2 AS (SELECT doc_id, nt,
       |         CAST(SUM(nt) OVER (ORDER BY doc_id
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |              AS BIGINT) AS cum
       |       FROM cho),
       |e AS (SELECT doc_id, nt, cum, cum - nt AS st,
       |        UNNEST(range((cum - nt) // 2048, (cum - 1) // 2048 + 1)) AS bin
       |      FROM c2)
       |SELECT CAST(bin AS BIGINT) AS bin_id,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN st // 2048 = bin THEN 1 ELSE 0 END) AS BIGINT) AS docs_starting,
       |  CAST(SUM(least(cum, (bin+1)*2048) - greatest(st, bin*2048)) AS BIGINT) AS fill_tokens,
       |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
       |FROM e GROUP BY bin
       |ORDER BY bin_id""".stripMargin

  val sp09 = QueryDef.sql("sp09_curation_pipeline",
    s"""WITH $qualityCte,
       |rules AS (SELECT doc_id, keep FROM (
       |${ta09.oracle.get}
       |) r),
       |fp AS (SELECT doc_id, md5(text) AS f FROM documents),
       |g0 AS (SELECT q.doc_id, q.nt, q.quality, fp.f
       |       FROM q JOIN rules USING (doc_id) JOIN fp USING (doc_id)
       |       WHERE rules.keep),
       |surv AS (SELECT f, MIN(doc_id) AS sid FROM g0 GROUP BY f),
       |gated AS (SELECT g0.doc_id, g0.nt, g0.quality
       |          FROM g0 JOIN surv ON surv.f = g0.f AND surv.sid = g0.doc_id),
       |${budgetPackSql("gated")}""".stripMargin) { (s, d) =>
    val rules = ta09.fn(s, d).select(col("doc_id"), col("keep"))
    val fp = T.documents(s, d).select(col("doc_id"), md5(col("text")).as("f"))
    val g0 = qualityDf(s, d)
      .join(rules, "doc_id").filter(col("keep"))
      .join(fp, "doc_id")
    val surv = g0.groupBy("f").agg(min("doc_id").as("sid"))
    val gated = g0.join(surv,
        g0("f") === surv("f") && g0("doc_id") === surv("sid"))
      .select(g0("doc_id"), g0("nt"), g0("quality"))
    budgetPack(gated)
  }

  /** sp10 — temperature-scaled mixture sampling: sp03's rebalance rule
    * at temperature α=0.5, the multilingual-LM standard (XLM-R/mT5
    * upsample low-resource languages with p ∝ share^α rather than
    * flattening the mix outright). weight = (min_tokens/tokens)^0.5 —
    * the α=1 case IS sp03's min/tokens — and each document is kept by
    * the same deterministic md5-uniform test sp02/sp08 use, so the
    * realized per-language sample sits next to its target weight in
    * one low-cardinality audit row. Exact cross-engine by
    * construction: integer token totals, ONE division, ONE sqrt (IEEE
    * correctly-rounded in any engine), and the md5-fraction compare —
    * no float sums, no normalization over languages (a cross-language
    * Σ of doubles would be order-sensitive; pairwise-to-min ratios are
    * not). Scale: one hash agg + a broadcast 5-row weight join +
    * stateless filter. */
  val sp10 = QueryDef.sql("sp10_temperature_mixture",
    """WITH lt AS (
      |  SELECT lang, CAST(SUM(len(string_split(text,' '))) AS BIGINT) AS tokens,
      |    COUNT(*) AS n_docs
      |  FROM documents GROUP BY lang),
      |mn AS (SELECT MIN(tokens) AS m FROM lt),
      |w AS (SELECT lang, tokens, n_docs, sqrt((mn.m * 1e0) / tokens) AS weight
      |      FROM lt, mn),
      |s AS (SELECT d.lang, COUNT(*) AS n_sampled
      |      FROM documents d JOIN w ON d.lang = w.lang
      |      WHERE (CAST(('0x'||substr(md5(CAST(d.doc_id AS VARCHAR)),1,8)) AS BIGINT) * 1e0)
      |              / 4294967296e0 < w.weight
      |      GROUP BY d.lang)
      |SELECT w.lang, w.tokens, w.n_docs, w.weight,
      |  COALESCE(s.n_sampled, 0) AS n_sampled
      |FROM w LEFT JOIN s ON w.lang = s.lang
      |ORDER BY w.lang""".stripMargin) { (s, d) =>
    val lt = T.documents(s, d)
      .withColumn("ntok", size(split(col("text"), " ")).cast("long"))
      .groupBy("lang").agg(sum("ntok").as("tokens"), count(lit(1)).as("n_docs"))
    val mn = lt.agg(min("tokens").as("m"))
    val w = lt.crossJoin(broadcast(mn))
      .select(col("lang"), col("tokens"), col("n_docs"),
        sqrt(col("m") * lit(1.0) / col("tokens")).as("weight"))
    val u = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("long") * lit(1.0) / lit(4294967296.0)
    val sampled = T.documents(s, d)
      .join(broadcast(w.select(col("lang"), col("weight"))), "lang")
      .filter(u < col("weight"))
      .groupBy("lang").agg(count(lit(1)).as("n_sampled"))
    w.join(sampled, Seq("lang"), "left")
      .select(col("lang"), col("tokens"), col("n_docs"), col("weight"),
        coalesce(col("n_sampled"), lit(0L)).as("n_sampled"))
      .orderBy("lang")
  }

  /** sp11 — the INCREMENTAL curation pipeline: sp09's composition with
    * dd16's near-dup admission in place of exact-hash dedup (r12
    * verdict #8). One job takes a crawl batch through rule gate (ta09)
    * → MinHash band-index admission of the doc_id % 5 delta against the
    * gated standing corpus (dd16's banded evidence incl. the stop-band
    * prune; gated corpus docs pass, delta docs with ≥4 shared bands
    * against corpus or a lower-id batch doc are dropped; sub-3-token
    * docs carry no signature hence no evidence — admitted) → half-token-
    * budget selection over quality order → 2048-token sequence packing.
    *
    * The point is COMPOSITION WITHOUT BARRIERS: unlike dd16 standalone
    * (which caches its signature tables — the right call when the
    * admission verdict is the product), the gate → signatures → both
    * evidence joins → admission chain here is ONE lazy DAG — no cache,
    * no eager action, no intermediate write; the only materialization
    * points in the whole query are the two GlobalCumsum prefix-sum
    * passes (sp09's documented two-pass scans) and the 1-row token
    * total broadcast. PlanShapeSpec locks zero InMemoryTableScans,
    * zero windows, zero cartesians. The oracle re-derives every stage
    * end-to-end, so drift in ANY stage is a hash miss here even when
    * the stage's own query stays green. */
  val sp11 = QueryDef.sql("sp11_incremental_curation_pipeline",
    s"""WITH $qualityCte,
       |rules AS (SELECT doc_id, keep FROM (
       |${ta09.oracle.get}
       |) r),
       |gd AS (SELECT q.doc_id, q.nt, q.quality, d.text
       |       FROM q JOIN rules USING (doc_id)
       |              JOIN documents d USING (doc_id)
       |       WHERE rules.keep),
       |toks AS (SELECT doc_id, string_split(text,' ') t FROM gd
       |         WHERE len(string_split(text,' ')) >= 3),
       |sh0 AS (SELECT DISTINCT doc_id,
       |          CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) AS h FROM (
       |  SELECT doc_id, UNNEST(list_transform(range(1, len(t)-1),
       |    i -> t[i]||' '||t[i+1]||' '||t[i+2])) AS s FROM toks)),
       |sig AS (SELECT doc_id, i, MIN(md5(i||':'||CAST(h AS VARCHAR))) AS m
       |        FROM sh0, generate_series(0, 7) g(i) GROUP BY doc_id, i),
       |inc AS (SELECT * FROM sig WHERE doc_id % 5 = 0),
       |corp AS (SELECT * FROM sig WHERE doc_id % 5 <> 0),
       |stopb AS (SELECT i, m FROM corp GROUP BY i, m HAVING COUNT(*) > 100),
       |incp AS (SELECT inc.* FROM inc
       |         WHERE NOT EXISTS (SELECT 1 FROM stopb
       |                           WHERE stopb.i = inc.i AND stopb.m = inc.m)),
       |cvc AS (SELECT da, MAX(cnt) AS corpus_max FROM (
       |    SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS cnt
       |    FROM incp a JOIN corp b ON a.i = b.i AND a.m = b.m
       |    GROUP BY 1, 2) q1 GROUP BY da),
       |dvd AS (SELECT da, MAX(cnt) AS batch_max FROM (
       |    SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS cnt
       |    FROM incp a JOIN incp b ON a.i = b.i AND a.m = b.m
       |                           AND b.doc_id < a.doc_id
       |    GROUP BY 1, 2) q2 GROUP BY da),
       |adm AS (SELECT gd.doc_id, gd.nt, gd.quality
       |        FROM gd LEFT JOIN cvc ON cvc.da = gd.doc_id
       |                LEFT JOIN dvd ON dvd.da = gd.doc_id
       |        WHERE gd.doc_id % 5 <> 0
       |           OR (COALESCE(cvc.corpus_max, 0) < 4
       |               AND COALESCE(dvd.batch_max, 0) < 4)),
       |${budgetPackSql("adm")}""".stripMargin) { (s, d) =>
    val adm = admittedCuration(s, d)
    // sp09's budget + packing tail over the admitted set
    budgetPack(adm)
  }

  /** sp11's fused gate → signatures → evidence → admission chain,
    * factored so PlanShapeSpec can lock THIS frame's physical plan
    * (the query's own executed plan is the packing tail downstream of
    * the GlobalCumsum checkpoints, which would hide the chain). Fully
    * lazy — no cache, no eager action (see the sp11 scaladoc). */
  private[graft] def admittedCuration(s: SparkSession, d: String): DataFrame = {
    import graft.streaming.{Streams => St}
    val rules = ta09.fn(s, d).select(col("doc_id"), col("keep"))
    val gated = qualityDf(s, d)
      .join(rules, "doc_id").filter(col("keep"))
      .join(T.documents(s, d).select("doc_id", "text"), "doc_id")
      .select("doc_id", "nt", "quality", "text")
    // dd16's admission evidence, inlined and fully lazy.
    // ONE exchange keyed the way every consumer needs it (guide §2.4):
    // the stop-band census, the corpus-evidence join, and the batch
    // self-join all key on (i, m), but with the exchange BELOW the
    // signature kernel each consumer re-ran the minhash_sigs shingle
    // chain over the whole gated corpus (three kernel stages per sp11
    // run). Repartitioning the long-form signatures by (i, m) puts one
    // shared exchange ABOVE the kernel: the shingle+md5 chain runs
    // once and all three consumers read co-partitioned (doc_id, i, m)
    // rows — 3 small columns, never the text payload (guide §8).
    val sigs = St.scalarSignatures(gated.select("doc_id", "text"))
      .repartition(col("i"), col("m"))
    val inc = sigs.filter(col("doc_id") % 5 === 0)
    val corp = sigs.filter(col("doc_id") % 5 =!= 0)
      .withColumnRenamed("doc_id", "db")
    val stopB = corp.groupBy("i", "m").agg(count(lit(1)).as("bdf"))
      .filter(col("bdf") > 100).select("i", "m")
    val incP = inc.join(broadcast(stopB), Seq("i", "m"), "left_anti")
    val cvc = incP.join(corp, Seq("i", "m"))
      .groupBy(col("doc_id"), col("db")).agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id").agg(max("cnt").as("corpus_max"))
    val dvd = incP.as("a")
      .join(incP.as("b"),
        col("a.i") === col("b.i") && col("a.m") === col("b.m") &&
          col("b.doc_id") < col("a.doc_id"))
      .groupBy(col("a.doc_id").as("doc_id"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id").agg(max("cnt").as("batch_max"))
    gated
      .join(cvc, Seq("doc_id"), "left")
      .join(dvd, Seq("doc_id"), "left")
      .filter(col("doc_id") % 5 =!= 0 ||
        (coalesce(col("corpus_max"), lit(0L)) < 4 &&
          coalesce(col("batch_max"), lit(0L)) < 4))
      .select("doc_id", "nt", "quality")
  }

  val defs: Seq[QueryDef] =
    Seq(ta08, ta09, ta10, sp01, sp02, sp03, sp04, sp05, sp06, sp07, sp08,
      sp09, sp10, sp11, dd08, dd09, dd18)
}
