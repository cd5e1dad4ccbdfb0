package graft.operators

import graft.{QueryDef, Tables => T}
import graft.functions.ExactAgg._
import org.apache.spark.sql.functions._

/** Core relational surface: scan → filter → join → aggregate → top-k,
  * TPC-H-shaped over the driver test tables (FIXTURES.md §B).
  *
  * The reference (borisfoko/Spark-Text-Clustering) has no relational
  * operators — its only join-like op is the broadcast vocab lookup at
  * `LDALoader.scala:97-105` and its only aggregation is the word count at
  * `LDAClustering.scala:144-146` (SURVEY.md §2.9). This module supplies
  * the declared relational extension surface, Spark-first.
  *
  * Scale notes (100 TB):
  *  - dimension tables (region/nation/supplier/customer at low SF) are
  *    broadcast explicitly; fact-fact joins (orders⋈lineitem) shuffle on
  *    the join key and benefit from AQE skew splitting (enabled in the
  *    session).
  *  - every aggregate is a partial+final HashAggregate (map-side combine)
  *    — nothing collects to the driver except final small results.
  *  - filters are plain column predicates so they push into the parquet
  *    scan (verified via explain: PushedFilters).
  */
object Relational {

  /** q01 — TPC-H Q1-style pricing summary: full-scan filter + 8-way agg. */
  val q01 = QueryDef.sql("q01_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(CAST(SUM(CAST(l_extendedprice * (1e0 - l_discount) AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS DOUBLE) / 1000000 AS sum_disc_price,
      |  CAST(CAST(SUM(CAST(l_extendedprice * (1e0 - l_discount) * (1e0 + l_tax) AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS DOUBLE) / 1000000 AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    // widened (guide §2.5 input skew): the fused scan+partial-agg runs
    // in ONE task over a single-row-group file, and the 8-way decimal
    // aggregation is the dominant cost (measured 3.0 s fused vs 0.9 s
    // widened at sf0.1; decode floor 0.74 s). Filter stays below the
    // exchange so PushedFilters is unchanged; decimal sums are
    // order-independent by construction (ExactAgg).
    T.widened(T.lineitem(s, d)
        .filter(col("l_shipdate") <= to_timestamp(lit("2000-09-02"))))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsumWide(col("l_extendedprice") * (lit(1.0) - col("l_discount")), D6).as("sum_disc_price"),
        dsumWide(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")), D6).as("sum_charge"),
        (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
        (dsum(col("l_discount")) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** q02 — global top-k: TakeOrderedAndProject, no full sort at scale. */
  val q02 = QueryDef.sql("q02_topk_orders",
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 10""".stripMargin) { (s, d) =>
    T.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
  }

  /** q03 — customer revenue: fact-fact shuffle join + broadcast dim. */
  val q03 = QueryDef.sql("q03_revenue_by_customer",
    """SELECT c.c_custkey, c.c_name,
      |  CAST(SUM(CAST(l.l_extendedprice * (1e0 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM customer c
      |JOIN orders o ON c.c_custkey = o.o_custkey
      |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |GROUP BY c.c_custkey, c.c_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin) { (s, d) =>
    val c = T.customer(s, d)
    val o = T.orders(s, d)
    val l = T.lineitem(s, d)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(c("c_custkey"), c("c_name"))
      .agg(
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), D6).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** q04 — semi join (EXISTS): orders with a returned line, by priority. */
  val q04 = QueryDef.sql("q04_priority_returned",
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders o
      |WHERE EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    val o = T.orders(s, d)
    val l = T.lineitem(s, d).filter(col("l_returnflag") === "R")
    o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** q05 — TPC-H Q5-style 6-table join: local supplier revenue by nation.
    * Dims broadcast; the only shuffles are the two fact joins + final agg. */
  val q05 = QueryDef.sql("q05_local_supplier_revenue",
    """SELECT n.n_name,
      |  CAST(CAST(SUM(CAST(l.l_extendedprice * (1e0 - l.l_discount) AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS DOUBLE) / 1000000 AS revenue
      |FROM customer c
      |JOIN orders o ON c.c_custkey = o.o_custkey
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |JOIN supplier sp ON l.l_suppkey = sp.s_suppkey AND c.c_nationkey = sp.s_nationkey
      |JOIN nation n ON sp.s_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |WHERE r.r_name IN ('ASIA', 'EUROPE')
      |  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o.o_orderdate < TIMESTAMP '2000-01-01'
      |GROUP BY n.n_name
      |ORDER BY revenue DESC, n_name""".stripMargin) { (s, d) =>
    val c = T.customer(s, d)
    val o = T.orders(s, d)
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
        col("o_orderdate") < to_timestamp(lit("2000-01-01")))
    val l = T.lineitem(s, d)
    val sp = T.supplier(s, d)
    val n = T.nation(s, d)
    val r = T.region(s, d).filter(col("r_name").isin("ASIA", "EUROPE"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(sp),
        l("l_suppkey") === sp("s_suppkey") && c("c_nationkey") === sp("s_nationkey"))
      .join(broadcast(n), sp("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy("n_name")
      .agg(dsumWide(col("l_extendedprice") * (lit(1.0) - col("l_discount")), D6).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** q06 — pushdown-friendly filter + single agg (TPC-H Q6 shape). */
  val q06 = QueryDef.sql("q06_forecast_revenue",
    """SELECT CAST(CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS DOUBLE) / 1000000 AS revenue,
      |       COUNT(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND l_discount >= 0.03e0 AND l_discount <= 0.07e0
      |  AND l_quantity < 24e0""".stripMargin) { (s, d) =>
    T.lineitem(s, d)
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1998-01-01")) &&
        col("l_discount") >= 0.03 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24.0)
      .agg(
        dsumWide(col("l_extendedprice") * col("l_discount"), D6).as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  /** q07 — left-semi join: active customers per market segment. */
  val q07 = QueryDef.sql("q07_active_customers",
    """SELECT c_mktsegment, COUNT(*) AS n_customers
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
    val c = T.customer(s, d)
    val o = T.orders(s, d)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("c_mktsegment")
  }

  /** q08 — left-anti join: customers with no orders. */
  val q08 = QueryDef.sql("q08_idle_customers",
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    val c = T.customer(s, d)
    val o = T.orders(s, d)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  /** q09 — aggregate + HAVING: wide orders (>4 line items). */
  val q09 = QueryDef.sql("q09_wide_orders",
    """SELECT l_orderkey, COUNT(*) AS n_lines,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
      |FROM lineitem
      |GROUP BY l_orderkey
      |HAVING COUNT(*) > 4
      |ORDER BY n_lines DESC, l_orderkey
      |LIMIT 100""".stripMargin) { (s, d) =>
    T.lineitem(s, d)
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_lines"), dsum(col("l_quantity")).as("total_qty"))
      .filter(col("n_lines") > 4)
      .orderBy(col("n_lines").desc, col("l_orderkey"))
      .limit(100)
  }

  /** q10 — TPC-H Q10-style: returned-item losses per customer + nation. */
  val q10 = QueryDef.sql("q10_returned_losses",
    """SELECT c.c_custkey, c.c_name, n.n_name,
      |  CAST(SUM(CAST(l.l_extendedprice * (1e0 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      |FROM customer c
      |JOIN orders o ON c.c_custkey = o.o_custkey
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |WHERE l.l_returnflag = 'R'
      |  AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o.o_orderdate < TIMESTAMP '1999-01-01'
      |GROUP BY c.c_custkey, c.c_name, n.n_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin) { (s, d) =>
    val c = T.customer(s, d)
    val o = T.orders(s, d)
      .filter(col("o_orderdate") >= to_timestamp(lit("1997-01-01")) &&
        col("o_orderdate") < to_timestamp(lit("1999-01-01")))
    val l = T.lineitem(s, d).filter(col("l_returnflag") === "R")
    val n = T.nation(s, d)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(c("c_custkey"), c("c_name"), n("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), D6).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val defs: Seq[QueryDef] = Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10)
}
