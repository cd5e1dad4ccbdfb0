package graft.operators

import graft.{QueryDef, Tables => T}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table: token counting,
  * quality scoring, corpus profiling, fingerprinting, language-ID.
  *
  * The reference's text surface is tokenize/stopword/stem over book files
  * (`LDAClustering.scala:132-139`); these ops are the training-data-
  * pipeline generalization (declared north-star extension, BASELINE.json).
  *
  * Everything is a codegen'd built-in expression (split / size / filter
  * lambdas / translate) — no Scala UDFs — so whole-stage codegen covers
  * each query end-to-end and the ops scale as pure narrow maps + one
  * final aggregate. At 100 TB: per-doc ops are embarrassingly parallel;
  * the groupBy(lang) aggregates are low-cardinality hash aggs with
  * map-side partials.
  */
object TextAnalysis {

  private val stop = "('the','a','of')"

  /** ta01 — token counting per language (whitespace tokenization). */
  val ta01 = QueryDef.sql("ta01_token_stats",
    """SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(len(string_split(text,' '))) AS BIGINT) AS total_tokens,
      |  CAST(SUM(len(string_split(text,' '))) AS BIGINT) / COUNT(*) AS avg_tokens,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM documents
      |GROUP BY lang
      |ORDER BY lang""".stripMargin) { (s, d) =>
    T.documents(s, d)
      .withColumn("nt", size(split(col("text"), " ")))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nt").cast("long")).as("total_tokens"),
        (sum(col("nt").cast("long")) / count(lit(1))).as("avg_tokens"),
        sum(col("n_chars")).as("total_chars"))
      .orderBy("lang")
  }

  /** ta02 — per-document quality score: lexical-diversity, length and
    * stopword-density components, deterministic double arithmetic. */
  val ta02 = QueryDef.sql("ta02_quality_score",
    s"""SELECT doc_id, nt, nd,
       |  (nd * 1e0) / nt AS distinct_ratio,
       |  (nonspace * 1e0) / nt AS avg_wlen,
       |  (nstop * 1e0) / nt AS stop_ratio,
       |  0.3e0 * ((nd * 1e0) / nt) + 0.4e0 * least((nt * 1e0) / 100e0, 1e0)
       |    + 0.3e0 * (1e0 - (nstop * 1e0) / nt) AS quality
       |FROM (
       |  SELECT doc_id,
       |    CAST(len(string_split(text,' ')) AS INTEGER) AS nt,
       |    CAST(len(list_distinct(string_split(text,' '))) AS INTEGER) AS nd,
       |    CAST(length(replace(text,' ','')) AS INTEGER) AS nonspace,
       |    CAST(len(list_filter(string_split(text,' '), x -> x IN $stop)) AS INTEGER) AS nstop
       |  FROM documents) t
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    T.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("t"), col("text"))
      .select(col("doc_id"),
        size(col("t")).as("nt"),
        size(array_distinct(col("t"))).as("nd"),
        length(translate(col("text"), " ", "")).as("nonspace"),
        expr(s"size(filter(t, x -> x IN $stop))").as("nstop"))
      .select(col("doc_id"), col("nt"), col("nd"),
        (col("nd") * lit(1.0) / col("nt")).as("distinct_ratio"),
        (col("nonspace") * lit(1.0) / col("nt")).as("avg_wlen"),
        (col("nstop") * lit(1.0) / col("nt")).as("stop_ratio"),
        (lit(0.3) * (col("nd") * lit(1.0) / col("nt")) +
          lit(0.4) * least(col("nt") * lit(1.0) / lit(100.0), lit(1.0)) +
          lit(0.3) * (lit(1.0) - col("nstop") * lit(1.0) / col("nt"))).as("quality"))
      .orderBy("doc_id")
  }

  /** ta03 — corpus profile per (lang, source): marker-term prevalence. */
  val ta03 = QueryDef.sql("ta03_corpus_profile",
    """SELECT lang, source, COUNT(*) AS n_docs,
      |  SUM(CASE WHEN strpos(text, 'spark') > 0 THEN 1 ELSE 0 END) * 1e0 / COUNT(*) AS pct_spark,
      |  SUM(CASE WHEN strpos(text, 'the') > 0 THEN 1 ELSE 0 END) * 1e0 / COUNT(*) AS pct_the,
      |  CAST(SUM(n_chars) AS BIGINT) / COUNT(*) AS avg_chars
      |FROM documents
      |GROUP BY lang, source
      |ORDER BY lang, source""".stripMargin) { (s, d) =>
    T.documents(s, d)
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        (sum(when(instr(col("text"), "spark") > 0, 1).otherwise(0)) * lit(1.0) / count(lit(1))).as("pct_spark"),
        (sum(when(instr(col("text"), "the") > 0, 1).otherwise(0)) * lit(1.0) / count(lit(1))).as("pct_the"),
        (sum(col("n_chars")) / count(lit(1))).as("avg_chars"))
      .orderBy("lang", "source")
  }

  /** ta04 — document fingerprinting: content hash + order-insensitive
    * bag-of-words hash (md5 is portable across engines). */
  val ta04 = QueryDef.sql("ta04_fingerprints",
    """SELECT doc_id,
      |  md5(text) AS fp_exact,
      |  md5(array_to_string(list_sort(string_split(text,' ')),' ')) AS fp_bag
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    T.documents(s, d)
      .select(col("doc_id"),
        md5(col("text")).as("fp_exact"),
        md5(array_join(array_sort(split(col("text"), " ")), " ")).as("fp_bag"))
      .orderBy("doc_id")
  }

  /** ta05 — language-ID by marker-term voting (n-gram-heuristic shape):
    * deterministic score per language, fixed-precedence argmax, reported
    * as a confusion matrix against the labeled `lang` column. */
  val ta05 = QueryDef.sql("ta05_langid_confusion",
    """SELECT lang, predicted, COUNT(*) AS n
      |FROM (
      |  SELECT lang,
      |    CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
      |         WHEN s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
      |         WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
      |         WHEN s_fr >= s_zh THEN 'fr'
      |         ELSE 'zh' END AS predicted
      |  FROM (
      |    SELECT lang,
      |      len(list_filter(string_split(text,' '), x -> x IN ('the','a'))) AS s_en,
      |      len(list_filter(string_split(text,' '), x -> x IN ('join','merge'))) AS s_de,
      |      len(list_filter(string_split(text,' '), x -> x IN ('sort','hash'))) AS s_es,
      |      len(list_filter(string_split(text,' '), x -> x IN ('scan','filter'))) AS s_fr,
      |      len(list_filter(string_split(text,' '), x -> x IN ('stream','batch'))) AS s_zh
      |    FROM documents) t) p
      |GROUP BY lang, predicted
      |ORDER BY lang, predicted""".stripMargin) { (s, d) =>
    T.documents(s, d)
      .select(col("lang"), split(col("text"), " ").as("t"))
      .select(col("lang"),
        expr("size(filter(t, x -> x IN ('the','a')))").as("s_en"),
        expr("size(filter(t, x -> x IN ('join','merge')))").as("s_de"),
        expr("size(filter(t, x -> x IN ('sort','hash')))").as("s_es"),
        expr("size(filter(t, x -> x IN ('scan','filter')))").as("s_fr"),
        expr("size(filter(t, x -> x IN ('stream','batch')))").as("s_zh"))
      .withColumn("predicted",
        expr("""CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
               |     WHEN s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
               |     WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
               |     WHEN s_fr >= s_zh THEN 'fr'
               |     ELSE 'zh' END""".stripMargin))
      .groupBy("lang", "predicted")
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "predicted")
  }

  /** ta06 — boilerplate n-gram detection (CCNet-style): trigrams shared
    * by MANY documents are template/boilerplate candidates for removal.
    * Exactly the document-frequency side of the dedup family's shingle
    * index — one explode + distinct-per-doc aggregation, top-k by df
    * with a pinned tie-break. At 100 TB the high-df tail is tiny (few
    * shingles clear a high df), so the top-k slice is cheap after the
    * hash aggregate. */
  val ta06 = QueryDef.sql("ta06_boilerplate_ngrams",
    """SELECT s AS shingle, df FROM (
      |  SELECT s, COUNT(DISTINCT doc_id) AS df FROM (
      |    SELECT doc_id, UNNEST(list_transform(range(1, len(t)-1),
      |      i -> t[i]||' '||t[i+1]||' '||t[i+2])) AS s
      |    FROM (SELECT doc_id, string_split(text,' ') AS t FROM documents
      |          WHERE len(string_split(text,' ')) >= 3) toks) u
      |  GROUP BY s) c
      |ORDER BY df DESC, shingle
      |LIMIT 20""".stripMargin) { (s, d) =>
    T.widened(T.documents(s, d), T.DenseKernelFloor)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), explode(
        expr("transform(sequence(0, size(t)-3), i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))")).as("s"))
      .groupBy("s")
      .agg(countDistinct(col("doc_id")).as("df"))
      .select(col("s").as("shingle"), col("df"))
      .orderBy(col("df").desc, col("shingle"))
      .limit(20)
  }

  /** ta07 — BPE-style token counting next to ta01's whitespace count:
    * the GPT-2 pre-tokenizer shape (space-prefixed letter runs, digit
    * runs, punctuation runs, residual whitespace), lookahead-free so the
    * same pattern runs under Java regex (Spark) and RE2 (DuckDB). A real
    * BPE adds a merges table on top of this split; the pre-tokenizer is
    * what determines token-count scaling, which is the statistic a
    * training-data pipeline budgets by. */
  private val bpePattern = " ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+| +"

  val ta07 = QueryDef.sql("ta07_bpe_token_stats",
    s"""SELECT lang,
       |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
       |  CAST(SUM(len(regexp_extract_all(text, '$bpePattern'))) AS BIGINT) AS bpe_tokens,
       |  CAST(SUM(len(regexp_extract_all(text, '$bpePattern'))) AS DOUBLE)
       |    / SUM(len(string_split(text, ' '))) AS bpe_per_ws
       |FROM documents
       |GROUP BY lang
       |ORDER BY lang""".stripMargin) { (s, d) =>
    T.documents(s, d)
      .withColumn("ws", size(split(col("text"), " ")).cast("long"))
      .withColumn("bpe",
        size(regexp_extract_all(col("text"), lit(bpePattern), lit(0))).cast("long"))
      .groupBy("lang")
      .agg(sum("ws").as("ws_tokens"),
        sum("bpe").as("bpe_tokens"),
        (sum("bpe").cast("double") / sum("ws")).as("bpe_per_ws"))
      .orderBy("lang")
  }

  /** ta11 — PII detection + redaction, the scrub every training
    * pipeline runs before anything ships. The synthetic corpus carries
    * no PII, so the query INJECTS a deterministic email + phone per
    * document (a pure function of doc_id, identical in the oracle) and
    * then proves the redactor finds and removes all of it: per
    * language, emails/phones found, redacted output size, and a
    * clean-sweep boolean (no '@' survives). Patterns stay in the
    * Java∩RE2 regex dialect intersection (same discipline as ta07's
    * BPE pattern). Narrow projection + hash agg — embarrassingly
    * parallel at 100 TB. */
  val ta11 = {
    val emailPat = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val phonePat = "\\+1-555-[0-9]{4}"
    QueryDef.sql("ta11_pii_redaction",
      s"""WITH inj AS (
         |  SELECT lang,
         |    text || ' contact user' || CAST(doc_id AS VARCHAR) ||
         |    '@mail.example.org or +1-555-' ||
         |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' now' AS t
         |  FROM documents),
         |red AS (
         |  SELECT lang, t,
         |    regexp_replace(regexp_replace(t, '$emailPat', '<EMAIL>', 'g'),
         |                   '$phonePat', '<PHONE>', 'g') AS r
         |  FROM inj)
         |SELECT lang, COUNT(*) AS n_docs,
         |  CAST(SUM(len(regexp_extract_all(t, '$emailPat'))) AS BIGINT) AS emails_found,
         |  CAST(SUM(len(regexp_extract_all(t, '$phonePat'))) AS BIGINT) AS phones_found,
         |  CAST(SUM(length(r)) AS BIGINT) AS redacted_chars,
         |  (SUM(CASE WHEN r LIKE '%@%' THEN 1 ELSE 0 END) = 0) AS clean_sweep
         |FROM red
         |GROUP BY lang
         |ORDER BY lang""".stripMargin) { (s, d) =>
      val injected = concat(col("text"), lit(" contact user"),
        col("doc_id").cast("string"), lit("@mail.example.org or +1-555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"), lit(" now"))
      T.documents(s, d)
        .withColumn("t", injected)
        .withColumn("r",
          regexp_replace(regexp_replace(col("t"), emailPat, "<EMAIL>"),
            phonePat, "<PHONE>"))
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(size(regexp_extract_all(col("t"), lit(emailPat), lit(0))))
            .as("emails_found"),
          sum(size(regexp_extract_all(col("t"), lit(phonePat), lit(0))))
            .as("phones_found"),
          sum(length(col("r"))).as("redacted_chars"),
          (sum(when(col("r").contains("@"), 1).otherwise(0)) === 0)
            .as("clean_sweep"))
        .orderBy("lang")
    }
  }

  /** ta12 — bigram language-model filtering, the KenLM-perplexity
    * quality gate every web-corpus pipeline runs, re-expressed in
    * hash-parity-safe arithmetic. The corpus itself is the LM: count
    * every adjacent token pair (bigram) and every context occurrence,
    * then score each document's transitions with add-1 smoothing,
    * p = (c12+1)/(c1+V). True perplexity exponentiates a mean of ln p
    * — libm vs StrictMath diverge in the last ulp (see ta10's ln-free
    * idf), so the reported per-doc statistics stay order-free and
    * exactly reproducible: MIN/MAX of p (each p is ONE IEEE division),
    * and the rare-transition rate (integer count of bigrams seen ≤1
    * time corpus-wide — the "novel text vs broken text" signal a
    * perplexity threshold encodes).
    *
    * Scale shape: bigrams carry 60-bit md5 fingerprints (8-byte
    * shuffle keys, collisions shared with the oracle); the two count
    * tables are vocab-bounded (Zipf-compact — broadcastable until the
    * vocab is billions); the final per-doc agg is map-side
    * combinable. No ln, no ordered float sums. */
  val ta12 = QueryDef.sql("ta12_bigram_lm_filter",
    """WITH toks AS (
      |  SELECT doc_id, string_split(text,' ') AS t FROM documents
      |  WHERE len(string_split(text,' ')) >= 2),
      |bg AS (
      |  SELECT doc_id,
      |    CAST(('0x'||substr(md5(t[i]),1,15)) AS BIGINT) AS h1,
      |    CAST(('0x'||substr(md5(t[i]||' '||t[i+1]),1,15)) AS BIGINT) AS h12
      |  FROM (SELECT doc_id, t, UNNEST(range(1, len(t))) AS i FROM toks) s),
      |cnt12 AS (SELECT h12, COUNT(*) AS c12 FROM bg GROUP BY h12),
      |cnt1 AS (SELECT h1, COUNT(*) AS c1 FROM bg GROUP BY h1),
      |v AS (SELECT COUNT(DISTINCT tok) AS vsz FROM
      |        (SELECT UNNEST(string_split(text,' ')) AS tok FROM documents) z),
      |sc AS (
      |  SELECT b.doc_id, cnt12.c12,
      |    CAST(cnt12.c12 + 1 AS DOUBLE) / CAST(cnt1.c1 + v.vsz AS DOUBLE) AS p
      |  FROM bg b JOIN cnt12 ON b.h12 = cnt12.h12
      |            JOIN cnt1 ON b.h1 = cnt1.h1, v)
      |SELECT doc_id, COUNT(*) AS n_bigrams,
      |  MIN(p) AS min_p, MAX(p) AS max_p,
      |  CAST(SUM(CASE WHEN c12 <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS rare_bigrams,
      |  CAST(SUM(CASE WHEN c12 <= 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS rare_ratio
      |FROM sc GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    bigramLmDocStats(s, d).orderBy("doc_id")
  }

  /** ta12's per-doc bigram-LM statistics, unsorted — shared with
    * ta14's quality bucketing. Cached per (application, dir) like
    * Dedup's shingle index: the LM count tables are the materialize-
    * once artifact of a real perplexity-gating pipeline, and the two
    * consumers would otherwise re-scan and re-count the corpus each.
    * The cache holds lazily-cached DataFrames for the session lifetime
    * (bounded: one per benchmarked sf dir). */
  private val lmStatsCache =
    scala.collection.concurrent.TrieMap.empty[String, org.apache.spark.sql.DataFrame]

  private[operators] def bigramLmDocStats(
      s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame =
    lmStatsCache.getOrElseUpdate(s"${s.sparkContext.applicationId}|$d",
      bigramLmDocStatsUncached(s, d).cache())

  private def bigramLmDocStatsUncached(
      s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    val fp = (c: org.apache.spark.sql.Column) =>
      conv(substring(md5(c), 1, 15), 16, 10).cast("long")
    val bg = T.widened(T.documents(s, d), T.DenseKernelFloor)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), col("t"),
        explode(expr("sequence(0, size(t)-2)")).as("i"))
      .select(col("doc_id"),
        fp(expr("t[i]")).as("h1"),
        fp(expr("concat(t[i], ' ', t[i+1])")).as("h12"))
    val cnt12 = bg.groupBy("h12").agg(count(lit(1)).as("c12"))
    val cnt1 = bg.groupBy("h1").agg(count(lit(1)).as("c1"))
    val v = T.widened(T.documents(s, d), T.DenseKernelFloor)
      .select(explode(split(col("text"), " ")).as("tok"))
      .agg(countDistinct(col("tok")).as("vsz"))
    bg.join(cnt12, "h12").join(cnt1, "h1").crossJoin(broadcast(v))
      .select(col("doc_id"), col("c12"),
        ((col("c12") + 1).cast("double") / (col("c1") + col("vsz")).cast("double")).as("p"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        min("p").as("min_p"), max("p").as("max_p"),
        sum(when(col("c12") <= 1, 1).otherwise(0)).cast("long").as("rare_bigrams"),
        (sum(when(col("c12") <= 1, 1).otherwise(0)).cast("double") / count(lit(1)))
          .as("rare_ratio"))
  }

  /** ta13 — BPE merge learning, step zero of training a tokenizer on
    * the corpus: count every adjacent character pair inside every word
    * occurrence (the statistic the first BPE merge maximizes — later
    * merges just re-run the same count over re-segmented symbols) and
    * rank the top 20 candidates. ta07 COUNTS tokens with a fixed
    * vocabulary; ta13 is the other half — LEARNING the vocabulary.
    * The per-word pair explode is a narrow map (fanout = word length),
    * the count is one map-side-combinable hash agg on 2-char keys
    * (alphabet², so the agg output is tiny no matter the corpus size),
    * and the top-20 is a TakeOrdered on that tiny table — at 100 TB
    * nothing but the scan and one shrinking agg. Tie-break pinned to
    * (count DESC, pair ASC). */
  val ta13 = QueryDef.sql("ta13_bpe_merge_learn",
    """WITH w AS (
      |  SELECT UNNEST(string_split(lower(text), ' ')) AS w FROM documents),
      |p AS (
      |  SELECT UNNEST(list_transform(range(1, len(w)), i -> substr(w, i, 2))) AS pair
      |  FROM w WHERE len(w) >= 2)
      |SELECT pair, COUNT(*) AS cnt FROM p
      |GROUP BY pair
      |ORDER BY cnt DESC, pair
      |LIMIT 20""".stripMargin) { (s, d) =>
    T.documents(s, d)
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(
        expr("transform(sequence(1, length(w)-1), i -> substring(w, i, 2))"))
        .as("pair"))
      .groupBy("pair")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(20)
  }

  /** ta14 — CCNet-style corpus partition into head/middle/tail quality
    * buckets (Wenzek et al. 2020 split the corpus into LM-perplexity
    * terciles; head feeds training, tail is discarded). The ranking key
    * here is ta12's EXACT bigram-LM statistics — rare-transition ratio,
    * then minimum smoothed probability, then doc_id — instead of float
    * perplexity: a mean-of-ln score diverges between libms in the last
    * ulp (see ta10's ln-free idf), and at 100 TB a bucket boundary that
    * moves with the math library silently reshuffles training data
    * between runs. Same signal (both are monotone in how surprising the
    * doc's transitions are), bit-reproducible boundary.
    *
    * Scale shape: the tercile assignment is rank-arithmetic over
    * [[graft.GlobalIndex]]'s distributed sort — NO single-partition
    * NTILE window (the oracle's NTILE is only the semantic spec); the
    * corpus count is the one driver-side long. Bucket sizes follow
    * NTILE exactly: the first n%3 buckets get one extra row. */
  val ta14 = QueryDef.sql("ta14_quality_buckets",
    """WITH toks AS (
      |  SELECT doc_id, string_split(text,' ') AS t FROM documents
      |  WHERE len(string_split(text,' ')) >= 2),
      |bg AS (
      |  SELECT doc_id,
      |    CAST(('0x'||substr(md5(t[i]),1,15)) AS BIGINT) AS h1,
      |    CAST(('0x'||substr(md5(t[i]||' '||t[i+1]),1,15)) AS BIGINT) AS h12
      |  FROM (SELECT doc_id, t, UNNEST(range(1, len(t))) AS i FROM toks) s),
      |cnt12 AS (SELECT h12, COUNT(*) AS c12 FROM bg GROUP BY h12),
      |cnt1 AS (SELECT h1, COUNT(*) AS c1 FROM bg GROUP BY h1),
      |v AS (SELECT COUNT(DISTINCT tok) AS vsz FROM
      |        (SELECT UNNEST(string_split(text,' ')) AS tok FROM documents) z),
      |sc AS (
      |  SELECT b.doc_id, cnt12.c12,
      |    CAST(cnt12.c12 + 1 AS DOUBLE) / CAST(cnt1.c1 + v.vsz AS DOUBLE) AS p
      |  FROM bg b JOIN cnt12 ON b.h12 = cnt12.h12
      |            JOIN cnt1 ON b.h1 = cnt1.h1, v),
      |docstats AS (
      |  SELECT doc_id, COUNT(*) AS n_bigrams, MIN(p) AS min_p,
      |    CAST(SUM(CASE WHEN c12 <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS rare_bigrams,
      |    CAST(SUM(CASE WHEN c12 <= 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS rare_ratio
      |  FROM sc GROUP BY doc_id),
      |bucketed AS (
      |  SELECT doc_id, n_bigrams, rare_bigrams,
      |    CAST(NTILE(3) OVER (ORDER BY rare_ratio DESC, min_p, doc_id) AS INT) AS bucket
      |  FROM docstats)
      |SELECT bucket, COUNT(*) AS n_docs,
      |  CAST(SUM(n_bigrams) AS BIGINT) AS sum_bigrams,
      |  CAST(SUM(rare_bigrams) AS BIGINT) AS sum_rare,
      |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
      |FROM bucketed
      |GROUP BY bucket
      |ORDER BY bucket""".stripMargin) { (s, d) =>
    val stats = bigramLmDocStats(s, d)
    val n = stats.count()
    val q = n / 3
    val r = n % 3
    val ranked = graft.GlobalIndex.withGlobalIndex(stats,
      Seq(col("rare_ratio").desc, col("min_p"), col("doc_id")), "gidx")
    // NTILE(3) from the 1-based global rank: first r buckets hold q+1
    // rows, the rest hold q (integer DIV — exact, no float rounding)
    val bucket = when(col("gidx") + 1 <= lit(r * (q + 1)),
        expr(s"(gidx + 1 + $q) DIV ${q + 1}"))
      .otherwise(expr(s"$r + (gidx + 1 - ${r * (q + 1)} + ${q - 1}) DIV ${math.max(q, 1L)}"))
    ranked.withColumn("bucket", bucket.cast("int"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_bigrams").as("sum_bigrams"),
        sum("rare_bigrams").as("sum_rare"),
        min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
      .orderBy("bucket")
  }

  /** ta15 — Count-Min-Sketch heavy hitters: estimate the counts of the
    * exact top-20 tokens from a depth=4 × width=256 CMS and audit the
    * estimates against truth (overcount ≥ 0 always — CMS never
    * undercounts — plus the realized ε-bound per row).
    *
    * Why a sketch, and why THIS shape at 100 TB: exact token counts
    * need a vocabulary-sized shuffle (the groupBy(token) here is the
    * AUDIT side, affordable only at bench scale). The sketch side
    * aggregates the raw token stream DIRECTLY into depth·width = 1024
    * cells — `explode(d) → (d, bucket) → sum` — so map-side combine
    * collapses every partition to ≤ 1024 rows before the shuffle no
    * matter how large the corpus or vocabulary is: constant-size state,
    * mergeable across partitions/streams, the same reason Spark ships
    * HLL/quantile sketches. Estimates then cost one broadcast lookup
    * per (query-token, row).
    *
    * Fully oracle-able, unlike library sketches: the hash family is
    * md5-derived (portable), so the REALIZED sketch — and therefore
    * every estimate and every bound boolean — is a deterministic
    * function of the data that DuckDB reproduces bit-for-bit; the
    * sketch's probabilistic guarantee shows up as the audited realized
    * booleans, not as an unverifiable tolerance. */
  val ta15 = QueryDef.sql("ta15_cms_heavy_hitters",
    """WITH tok AS (
      |  SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents),
      |n AS (SELECT COUNT(*) AS n FROM tok),
      |cells AS (
      |  SELECT d, CAST(('0x' || substr(md5(CAST(d AS VARCHAR) || '|' || tok), 1, 8)) AS BIGINT) % 256 AS bucket,
      |         COUNT(*) AS c
      |  FROM tok, (SELECT UNNEST(range(0, 4)) AS d) ds
      |  GROUP BY 1, 2),
      |top20 AS (
      |  SELECT tok, COUNT(*) AS exact_cnt FROM tok
      |  GROUP BY tok ORDER BY exact_cnt DESC, tok LIMIT 20),
      |est AS (
      |  SELECT t.tok, t.exact_cnt, MIN(c.c) AS est_cnt
      |  FROM top20 t
      |  JOIN cells c
      |    ON c.bucket = CAST(('0x' || substr(md5(CAST(c.d AS VARCHAR) || '|' || t.tok), 1, 8)) AS BIGINT) % 256
      |  GROUP BY t.tok, t.exact_cnt)
      |SELECT tok, CAST(exact_cnt AS BIGINT) AS exact_cnt,
      |  CAST(est_cnt AS BIGINT) AS est_cnt,
      |  CAST(est_cnt - exact_cnt AS BIGINT) AS overcount,
      |  est_cnt - exact_cnt <= 2 * (SELECT n FROM n) / 256 AS within_eps
      |FROM est
      |ORDER BY exact_cnt DESC, tok""".stripMargin) { (s, d) =>
    def bucket(dCol: org.apache.spark.sql.Column, tok: org.apache.spark.sql.Column) =
      conv(substring(md5(concat(dCol.cast("string"), lit("|"), tok)), 1, 8),
        16, 10).cast("long") % 256
    val tok = T.widened(T.documents(s, d), T.DenseKernelFloor)
      .select(explode(split(col("text"), " ")).as("tok"))
    // sketch build: raw stream → (d, bucket) → sum; partial aggregation
    // bounds every map task's output at depth·width rows
    val cells = tok
      .select(col("tok"), explode(expr("array(0, 1, 2, 3)")).as("d"))
      .withColumn("bucket", bucket(col("d"), col("tok")))
      .groupBy("d", "bucket").agg(count(lit(1)).as("c"))
    // ε audit without a second corpus scan (the st16 r9 trick): depth
    // row 0's cell sum IS the token count — every token lands in
    // exactly one bucket per row
    val nRow = cells.filter(col("d") === 0).agg(sum(col("c")).as("n_tok"))
    // audit side: exact top-20 (the vocabulary-sized shuffle the sketch
    // exists to avoid at scale)
    val top20 = tok.groupBy("tok").agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("tok")).limit(20)
    val est = top20
      .select(col("tok"), col("exact_cnt"),
        explode(expr("array(0, 1, 2, 3)")).as("d"))
      .withColumn("bucket", bucket(col("d"), col("tok")))
      .join(broadcast(cells), Seq("d", "bucket"))
      .groupBy("tok", "exact_cnt").agg(min(col("c")).as("est_cnt"))
    est
      .withColumn("overcount", col("est_cnt") - col("exact_cnt"))
      .crossJoin(broadcast(nRow))
      .withColumn("within_eps",
        col("est_cnt") - col("exact_cnt") <= lit(2L) * col("n_tok") / lit(256L))
      .select("tok", "exact_cnt", "est_cnt", "overcount", "within_eps")
      .orderBy(col("exact_cnt").desc, col("tok"))
  }

  /** ta16 — vocabulary-growth curve (Heaps' law diagnostics): cumulative
    * distinct-term count and type/token ratio at each corpus decile. A
    * saturating curve means the corpus stops contributing new language
    * (diminishing returns for further ingestion; near-dup or
    * boilerplate load); a linearly-growing one means high diversity (or
    * OCR noise). Everything stays exact-integer: V(prefix) = number of
    * terms whose FIRST occurrence falls before the prefix boundary, so
    * one min-aggregate per term (map-side combinable — the classic
    * first-occurrence trick; no per-prefix distinct-count passes),
    * bucketed into deciles and prefix-summed over the TEN decile rows
    * (a constant-size frame — the unpartitioned window is bounded by
    * construction, unlike the GlobalCumsum cases). The only double is
    * the final TTR division of two exact int64s. */
  val ta16 = QueryDef.sql("ta16_vocab_growth",
    """WITH nn AS (SELECT COUNT(*) AS n FROM documents),
      |tok AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS term
      |        FROM documents),
      |ft AS (SELECT term, MIN(doc_id) AS first_doc FROM tok GROUP BY term),
      |vb AS (SELECT least(9, CAST(first_doc * 10 // n AS INTEGER)) AS decile,
      |               COUNT(*) AS new_terms
      |        FROM ft, nn GROUP BY 1),
      |tb AS (SELECT least(9, CAST(doc_id * 10 // n AS INTEGER)) AS decile,
      |               COUNT(*) AS toks
      |        FROM tok, nn GROUP BY 1),
      |d AS (SELECT CAST(r AS INTEGER) AS decile FROM range(10) t(r)),
      |c AS (
      |  SELECT decile,
      |    CAST((decile + 1) * n // 10 AS BIGINT) AS prefix_docs,
      |    CAST(SUM(COALESCE(new_terms, 0)) OVER (ORDER BY decile) AS BIGINT)
      |      AS vocab_cum,
      |    CAST(SUM(COALESCE(toks, 0)) OVER (ORDER BY decile) AS BIGINT)
      |      AS tokens_cum
      |  FROM d LEFT JOIN vb USING (decile) LEFT JOIN tb USING (decile), nn)
      |SELECT decile, prefix_docs, vocab_cum, tokens_cum,
      |  CAST(vocab_cum AS DOUBLE) / tokens_cum AS ttr
      |FROM c ORDER BY decile""".stripMargin) { (s, d) =>
    val docs = T.documents(s, d)
    val nRow = docs.agg(count(lit(1)).as("n"))
    val tok = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val vb = tok.groupBy("term").agg(min("doc_id").as("first_doc"))
      .crossJoin(broadcast(nRow))
      .select(expr("least(9, CAST((first_doc * 10) div n AS INT))").as("decile"))
      .groupBy("decile").agg(count(lit(1)).as("new_terms"))
    val tb = tok.crossJoin(broadcast(nRow))
      .select(expr("least(9, CAST((doc_id * 10) div n AS INT))").as("decile"))
      .groupBy("decile").agg(count(lit(1)).as("toks"))
    // ten rows by construction — the unpartitioned window is bounded
    val w = org.apache.spark.sql.expressions.Window.orderBy("decile")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    s.range(10).select(col("id").cast("int").as("decile"))
      .join(vb, Seq("decile"), "left")
      .join(tb, Seq("decile"), "left")
      .crossJoin(broadcast(nRow))
      .select(col("decile"),
        expr("((decile + 1) * n) div 10").cast("long").as("prefix_docs"),
        sum(coalesce(col("new_terms"), lit(0L))).over(w).cast("long").as("vocab_cum"),
        sum(coalesce(col("toks"), lit(0L))).over(w).cast("long").as("tokens_cum"))
      .withColumn("ttr", col("vocab_cum").cast("double") / col("tokens_cum"))
      .orderBy("decile")
  }

  val defs: Seq[QueryDef] =
    Seq(ta01, ta02, ta03, ta04, ta05, ta06, ta07, ta11, ta12, ta13, ta14,
      ta15, ta16)
}
