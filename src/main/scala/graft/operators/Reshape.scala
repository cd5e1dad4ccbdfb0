package graft.operators

import graft.{QueryDef, Tables => T}
import graft.functions.ExactAgg._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Reshaping + remaining scalar families: pivot/unpivot, date
  * arithmetic, array predicates, regexp functions.
  */
object Reshape {

  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** q43 — pivot: user's daily event-type matrix via the native
    * `.pivot()` API with a pinned value list (deterministic columns);
    * the oracle is the portable CASE-WHEN form. */
  val q43 = QueryDef.sql("q43_pivot_event_matrix",
    """SELECT user_id,
      |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
      |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
      |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
      |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
      |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
      |FROM events
      |WHERE user_id < 50
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    T.events(s, d)
      .filter(col("user_id") < 50)
      .groupBy("user_id")
      .pivot("event_type", eventTypes)
      .agg(count(lit(1))) // missing cells are nulled post-pivot → na.fill
      .na.fill(0L, eventTypes)
      .orderBy("user_id")
  }

  /** q44 — unpivot (melt): the q43 matrix back to long form via the
    * native `unpivot` API; oracle = UNION ALL stack. */
  val q44 = QueryDef.sql("q44_unpivot_event_matrix",
    """WITH m AS (
      |  SELECT user_id,
      |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS click,
      |    SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS view
      |  FROM events WHERE user_id < 50 GROUP BY user_id)
      |SELECT user_id, kind, CAST(n AS BIGINT) AS n FROM (
      |  SELECT user_id, 'click' AS kind, click AS n FROM m
      |  UNION ALL
      |  SELECT user_id, 'view' AS kind, view AS n FROM m) u
      |ORDER BY user_id, kind""".stripMargin) { (s, d) =>
    val m = T.events(s, d)
      .filter(col("user_id") < 50)
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "view"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("click", "view"))
    m.unpivot(Array(col("user_id")), Array(col("click"), col("view")), "kind", "n")
      .orderBy("user_id", "kind")
  }

  /** q45 — date arithmetic: ship delay, quarter-shifted and month-end
    * dates (DATE domain on both engines for identical clamping). */
  val q45 = QueryDef.sql("q45_date_arithmetic",
    """SELECT l.l_orderkey, l.l_linenumber,
      |  CAST(date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE)) AS INTEGER) AS ship_delay_days,
      |  CAST(CAST(o.o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
      |  last_day(CAST(o.o_orderdate AS DATE)) AS month_end
      |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |WHERE l.l_orderkey <= 100
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    val l = T.lineitem(s, d).filter(col("l_orderkey") <= 100)
    // the key predicate transfers to orders through the equi-join, so the
    // broadcast side is the small FILTERED table, not the full fact
    val o = T.orders(s, d).filter(col("o_orderkey") <= 100)
    l.join(broadcast(o), l("l_orderkey") === o("o_orderkey"))
      .select(l("l_orderkey"), l("l_linenumber"),
        datediff(col("l_shipdate").cast("date"), col("o_orderdate").cast("date"))
          .cast(IntegerType).as("ship_delay_days"),
        add_months(col("o_orderdate").cast("date"), 3).as("plus3m"),
        last_day(col("o_orderdate").cast("date")).as("month_end"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** q46 — array predicates: exists / forall / filter-count over the
    * embedding vectors. */
  val q46 = QueryDef.sql("q46_array_predicates",
    """SELECT vec_id,
      |  len(list_filter(embedding, x -> x > 0)) = len(embedding) AS all_positive,
      |  len(list_filter(embedding, x -> abs(x) > 0.2e0)) > 0 AS has_large,
      |  CAST(len(list_filter(embedding, x -> x < 0)) AS INTEGER) AS n_negative
      |FROM embeddings
      |WHERE vec_id < 200
      |ORDER BY vec_id""".stripMargin) { (s, d) =>
    T.embeddings(s, d)
      .filter(col("vec_id") < 200)
      .select(col("vec_id"),
        expr("forall(embedding, x -> x > 0)").as("all_positive"),
        expr("exists(embedding, x -> abs(x) > 0.2D)").as("has_large"),
        expr("size(filter(embedding, x -> x < 0))").as("n_negative"))
      .orderBy("vec_id")
  }

  /** q47 — regexp family: count / replace-length / first-match. */
  val q47 = QueryDef.sql("q47_regexp_funcs",
    """SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, 'join')) AS INTEGER) AS n_join,
      |  CAST(length(regexp_replace(text, 'spark', 'SPARK', 'g')) AS INTEGER) AS replaced_len,
      |  regexp_extract(text, '(s[a-z]+)', 1) AS first_s_word
      |FROM documents
      |WHERE doc_id < 100
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    T.documents(s, d)
      .filter(col("doc_id") < 100)
      .select(col("doc_id"),
        expr("regexp_count(text, 'join')").as("n_join"),
        length(regexp_replace(col("text"), "spark", "SPARK")).as("replaced_len"),
        regexp_extract(col("text"), "(s[a-z]+)", 1).as("first_s_word"))
      .orderBy("doc_id")
  }

  val defs: Seq[QueryDef] = Seq(q43, q44, q45, q46, q47)
}
