package graft.operators

import graft.{QueryDef, Tables => T}
import graft.functions.ExactAgg._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Window-function surface: ranking, running totals, lag/lead, shares,
  * ntile. Absent from the reference (SURVEY.md §2.9) — declared extension.
  *
  * Scale notes: every window here partitions by a key (customer /
  * supplier / part) so the sort is per-partition after one hash shuffle —
  * no global sort. Ordering keys always include a unique tie-breaker so
  * results are deterministic under any partitioning (required both for
  * the oracle hash and for reproducible reruns at 100 TB).
  */
object Windows {

  /** q11 — top-3 orders per customer by price (ranking window). */
  val q11 = QueryDef.sql("q11_top_orders_per_customer",
    """SELECT o_custkey, o_orderkey, o_totalprice, rn
      |FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    T.orders(s, d)
      // bigint to byte-match DuckDB's BIGINT row_number
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy("o_custkey", "rn")
  }

  /** q12 — running total per supplier (frame = ROWS, exact decimal sum). */
  val q12 = QueryDef.sql("q12_running_supplier_qty",
    """SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
      |    PARTITION BY l_suppkey
      |    ORDER BY l_shipdate, l_orderkey, l_linenumber
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
      |FROM lineitem
      |WHERE l_suppkey <= 3
      |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("l_suppkey")
      .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    T.lineitem(s, d)
      .filter(col("l_suppkey") <= 3)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_shipdate"),
        sum(d2(col("l_quantity"))).over(w).cast(DoubleType).as("running_qty"))
      .orderBy("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber")
  }

  /** q13 — lag: price delta per part over ship time. */
  val q13 = QueryDef.sql("q13_price_delta_per_part",
    """SELECT l_partkey, l_orderkey, l_linenumber, l_extendedprice,
      |  l_extendedprice - LAG(l_extendedprice) OVER (
      |    PARTITION BY l_partkey
      |    ORDER BY l_shipdate, l_orderkey, l_linenumber) AS price_delta
      |FROM lineitem
      |WHERE l_partkey <= 20
      |ORDER BY l_partkey, l_shipdate, l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("l_partkey")
      .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
    T.lineitem(s, d)
      .filter(col("l_partkey") <= 20)
      .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"),
        (col("l_extendedprice") - lag("l_extendedprice", 1).over(w)).as("price_delta"),
        col("l_shipdate"))
      .orderBy("l_partkey", "l_shipdate", "l_orderkey", "l_linenumber")
      .drop("l_shipdate")
  }

  /** q14 — share-of-partition: order value vs customer total. */
  val q14 = QueryDef.sql("q14_order_share_of_customer",
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  o_totalprice / CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY o_custkey) AS DOUBLE) AS share
      |FROM orders
      |WHERE o_custkey <= 100
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("o_custkey")
    T.orders(s, d)
      .filter(col("o_custkey") <= 100)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        (col("o_totalprice") / sum(d2(col("o_totalprice"))).over(w).cast(DoubleType)).as("share"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** q15 — ntile quartiles of customers by balance × segment. NTILE over
    * the whole table is an unpartitioned window (single-partition sort —
    * fatal at 100 TB), so the engine computes it as a distributed
    * range-sort + global index (graft.GlobalIndex) and derives the
    * bucket with NTILE's exact arithmetic: the first n%k buckets get
    * ⌈n/k⌉ rows, the rest ⌊n/k⌋. The oracle keeps the declarative
    * NTILE form — same answer by construction. */
  val q15 = QueryDef.sql("q15_balance_quartiles",
    """SELECT quartile, c_mktsegment, COUNT(*) AS n,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
      |FROM (
      |  SELECT c_mktsegment, c_acctbal,
      |    NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile
      |  FROM customer) t
      |GROUP BY quartile, c_mktsegment
      |ORDER BY quartile, c_mktsegment""".stripMargin) { (s, d) =>
    val c = T.customer(s, d).select("c_mktsegment", "c_acctbal", "c_custkey")
    val n = c.count()
    val k = 4L
    val q = n / k
    val r = n % k
    val bnd = r * (q + 1) // rows below bnd fall in the ⌈n/k⌉-sized buckets
    val qSafe = math.max(q, 1L) // n<k: bnd==n, the otherwise-branch is dead
    graft.GlobalIndex.withGlobalIndex(c, Seq(col("c_acctbal"), col("c_custkey")), "idx")
      .withColumn("quartile",
        when(col("idx") < bnd, expr(s"idx div ${q + 1}") + 1L)
          .otherwise(expr(s"(idx - $bnd) div $qSafe") + (r + 1L)))
      .groupBy("quartile", "c_mktsegment")
      .agg(count(lit(1)).as("n"), dsum(col("c_acctbal")).as("total_bal"))
      .orderBy("quartile", "c_mktsegment")
  }

  /** q68 — time-interval RANGE window: trailing-7-day order count and
    * exact spend per customer, the moving-window feature shape every
    * time-series / training-data-freshness stat needs. The frame is a
    * VALUE range (all orders within the prior 6 days incl. the current
    * date — peers share one frame, so ties can't make the result
    * order-dependent), not a ROWS frame. Spark's DataFrame API takes
    * only numeric rangeBetween bounds, so the order key is the date as
    * epoch days with rangeBetween(-6, 0) — semantically identical to
    * the oracle's `RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT
    * ROW` over the raw date. The spend sum is decimal inside the frame
    * (order-free exactness) and cast to double once.
    *
    * Scale: one hash shuffle on o_custkey, per-partition sort by date —
    * the same plan as q12; the RANGE frame is evaluated with a sliding
    * two-pointer over the sorted partition, O(rows), no re-scan per
    * frame. */
  val q68 = QueryDef.sql("q68_interval_range_window",
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  CAST(COUNT(*) OVER w AS BIGINT) AS n_7d,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS spend_7d
      |FROM orders
      |WHERE o_custkey <= 100
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
      |             RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("epoch_day"))
      .rangeBetween(-6, 0)
    T.orders(s, d)
      .filter(col("o_custkey") <= 100)
      .withColumn("epoch_day", datediff(col("o_orderdate"), lit("1970-01-01").cast("date")))
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        count(lit(1)).over(w).cast("bigint").as("n_7d"),
        sum(d2(col("o_totalprice"))).over(w).cast(DoubleType).as("spend_7d"))
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
  }

  val defs: Seq[QueryDef] = Seq(q11, q12, q13, q14, q15, q68)
}
