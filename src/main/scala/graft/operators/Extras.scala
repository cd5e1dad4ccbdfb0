package graft.operators

import graft.{QueryDef, Tables => T}
import graft.functions.{ExactAgg, ExactMean}
import org.apache.spark.sql.functions._

/** Coverage extras: custom typed UDAF, sink/source round-trip, array
  * analytics over embeddings, and the salting pattern for skewed keys.
  */
object Extras {

  /** q34 — the Aggregator UDAF surface: exact mean per segment through
    * ExactMean (integer-cents buffer), oracle = the decimal-sum form. */
  val q34 = QueryDef.sql("q34_custom_udaf_mean",
    """SELECT c_mktsegment,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(c_acctbal) AS mean_bal,
      |  COUNT(*) AS n
      |FROM customer
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
    val meanUdaf = udaf(ExactMean)
    T.customer(s, d)
      .groupBy("c_mktsegment")
      .agg(meanUdaf(col("c_acctbal")).as("mean_bal"), count(lit(1)).as("n"))
      .orderBy("c_mktsegment")
  }

  /** q35 — JSON sink + source round-trip: write documents to JSON lines,
    * read back, aggregate — must equal the direct parquet path (the
    * oracle never sees the round-trip, so any escaping/type loss in the
    * json writer/reader would break the hash). */
  val q35 = QueryDef.sql("q35_json_roundtrip",
    """SELECT lang, COUNT(*) AS n, COUNT(DISTINCT md5(text)) AS n_unique,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM documents
      |GROUP BY lang
      |ORDER BY lang""".stripMargin) { (s, d) =>
    val tmp = java.nio.file.Files.createTempDirectory("graft_json").toString
    T.documents(s, d).write.mode("overwrite").json(tmp)
    s.read.json(tmp)
      .groupBy("lang")
      .agg(count(lit(1)).as("n"),
        countDistinct(md5(col("text"))).as("n_unique"),
        sum("n_chars").as("total_chars"))
      .orderBy("lang")
  }

  /** q36 — array analytics over the embedding column: min/max/mean and
    * L2 norm, all sequential-fold double arithmetic (engine-portable). */
  val q36 = QueryDef.sql("q36_array_stats",
    """SELECT vec_id,
      |  CAST(len(embedding) AS INTEGER) AS dim,
      |  list_min(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS mn,
      |  list_max(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS mx,
      |  list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))) / len(embedding) AS mean,
      |  sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS l2
      |FROM embeddings
      |WHERE vec_id < 100
      |ORDER BY vec_id""".stripMargin) { (s, d) =>
    T.embeddings(s, d)
      .filter(col("vec_id") < 100)
      .select(col("vec_id"),
        size(col("embedding")).as("dim"),
        array_min(expr("transform(embedding, x -> CAST(x AS DOUBLE))")).as("mn"),
        array_max(expr("transform(embedding, x -> CAST(x AS DOUBLE))")).as("mx"),
        expr("""aggregate(embedding, CAST(0 AS DOUBLE),
                (acc, x) -> acc + CAST(x AS DOUBLE)) / size(embedding)""").as("mean"),
        sqrt(expr("""aggregate(embedding, CAST(0 AS DOUBLE),
                     (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))""")).as("l2"))
      .orderBy("vec_id")
  }

  /** q37 — salted two-stage aggregation: the skew-mitigation pattern
    * (salt the hot key, partial-agg, merge) proven equivalent to the
    * plain aggregate by the oracle. Decimal partials merge exactly, so
    * salting cannot change the result — that algebraic property is what
    * makes the pattern safe to deploy against a skewed 100 TB key. */
  val q37 = QueryDef.sql("q37_salted_agg",
    """SELECT lang, COUNT(*) AS n,
      |  CAST(SUM(CAST(n_chars AS DECIMAL(18,2))) AS DOUBLE) AS total_chars
      |FROM documents
      |GROUP BY lang
      |ORDER BY lang""".stripMargin) { (s, d) =>
    T.documents(s, d)
      .withColumn("salt", pmod(col("doc_id"), lit(16)))
      .groupBy("lang", "salt") // stage 1: spreads a hot key over 16 tasks
      .agg(count(lit(1)).as("pn"),
        sum(col("n_chars").cast(ExactAgg.D2)).as("psum"))
      .groupBy("lang") // stage 2: merge partials (exact decimal)
      .agg(sum("pn").as("n"), sum("psum").cast("double").as("total_chars"))
      .orderBy("lang")
  }

  /** q60 — correlated EXISTS / NOT EXISTS: customers in a segment with
    * ≥1 urgent order but no returned lineitem. The DataFrame form is
    * the semi/anti join pair Catalyst's RewritePredicateSubquery
    * produces for the SQL form the oracle runs — both sides build a
    * hash table on the (small) filtered subquery and never materialize
    * the match multiplicity, which is what keeps EXISTS cheap when one
    * customer has thousands of orders. */
  val q60 = QueryDef.sql("q60_exists_anti_join",
    """SELECT c_custkey, c_name
      |FROM customer c
      |WHERE c_mktsegment = 'BUILDING'
      |  AND EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey
      |                AND o.o_orderpriority = '1-URGENT')
      |  AND NOT EXISTS (SELECT 1 FROM orders o JOIN lineitem l
      |                    ON l.l_orderkey = o.o_orderkey
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND l.l_returnflag = 'R')
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    val urgent = T.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    val returned = T.orders(s, d)
      .join(T.lineitem(s, d).filter(col("l_returnflag") === "R")
        .select(col("l_orderkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"))
    T.customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING")
      .join(urgent, col("c_custkey") === urgent("o_custkey"), "left_semi")
      .join(returned, col("c_custkey") === returned("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  val defs: Seq[QueryDef] = Seq(q34, q35, q36, q37, q60)
}
