package graft.operators

import graft.{QueryDef, Tables => T}
import graft.functions.ExactAgg._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Scalar function surface (string / date / math / conditional / json)
  * plus subquery patterns (scalar, IN, EXISTS-join). The reference's only
  * scalar ops are a regexp_replace-equivalent and split (SURVEY.md §2.9);
  * the rest is declared extension surface.
  *
  * Oracle parity notes: DuckDB length()/strpos()/year() return BIGINT
  * where Spark returns INT — oracles cast; math stays within
  * IEEE-exact ops (floor, abs, %, sqrt) so per-row doubles are
  * bit-identical; no pow/exp/ln in compared output (libm vs StrictMath
  * can differ in the last ulp).
  */
object Scalars {

  /** q22 — string functions over part. */
  val q22 = QueryDef.sql("q22_string_funcs",
    """SELECT p_partkey,
      |  upper(p_name) AS up_name,
      |  CAST(length(p_name) AS INTEGER) AS name_len,
      |  substring(p_name, 1, 5) AS pfx,
      |  replace(p_name, ' ', '_') AS snake,
      |  concat_ws('|', p_brand, p_type) AS cat,
      |  CAST(strpos(p_name, 'e') AS INTEGER) AS epos,
      |  lpad(p_brand, 10, '*') AS padded,
      |  reverse(p_name) AS rev
      |FROM part
      |WHERE p_partkey <= 100
      |ORDER BY p_partkey""".stripMargin) { (s, d) =>
    T.part(s, d)
      .filter(col("p_partkey") <= 100)
      .select(col("p_partkey"),
        upper(col("p_name")).as("up_name"),
        length(col("p_name")).as("name_len"),
        substring(col("p_name"), 1, 5).as("pfx"),
        regexp_replace(col("p_name"), " ", "_").as("snake"),
        concat_ws("|", col("p_brand"), col("p_type")).as("cat"),
        instr(col("p_name"), "e").as("epos"),
        lpad(col("p_brand"), 10, "*").as("padded"),
        reverse(col("p_name")).as("rev"))
      .orderBy("p_partkey")
  }

  /** q23 — date part extraction + agg by (year, quarter). */
  val q23 = QueryDef.sql("q23_orders_by_quarter",
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS y,
      |       CAST(quarter(o_orderdate) AS INTEGER) AS q,
      |       COUNT(*) AS n,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY 1, 2
      |ORDER BY y, q""".stripMargin) { (s, d) =>
    T.orders(s, d)
      .groupBy(year(col("o_orderdate")).as("y"), quarter(col("o_orderdate")).as("q"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .orderBy("y", "q")
  }

  /** q24 — CASE WHEN bucketing of order values. */
  val q24 = QueryDef.sql("q24_price_buckets",
    """SELECT CASE WHEN o_totalprice < 50000e0 THEN 'small'
      |            WHEN o_totalprice < 200000e0 THEN 'medium'
      |            ELSE 'large' END AS bucket,
      |       COUNT(*) AS n,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY 1
      |ORDER BY bucket""".stripMargin) { (s, d) =>
    T.orders(s, d)
      .groupBy(
        when(col("o_totalprice") < 50000.0, "small")
          .when(col("o_totalprice") < 200000.0, "medium")
          .otherwise("large").as("bucket"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .orderBy("bucket")
  }

  /** q25 — JSON field extraction from the events.props payload.
    * regexp_extract is used on both sides (portable; Spark's
    * get_json_object and DuckDB's json_extract_string agree too, but the
    * regex keeps the oracle dependency-free). */
  val q25 = QueryDef.sql("q25_json_props",
    """SELECT CAST(NULLIF(regexp_extract(props, '"k": (\d+)', 1), '') AS INTEGER) AS k,
      |       COUNT(*) AS n,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY 1
      |ORDER BY k""".stripMargin) { (s, d) =>
    T.events(s, d)
      .groupBy(regexp_extract(col("props"), "\"k\": (\\d+)", 1)
        .cast(IntegerType).as("k"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .orderBy("k")
  }

  /** q61 — Spark 4 VariantType: props parsed once into a variant value
    * (the open-schema binary JSON encoding that replaces
    * string-re-parsing per access), typed field extraction via
    * variant_get, and a typeof audit. At 100 TB semi-structured
    * columns, variant is the difference between one parse at ingest
    * and a JSON parse per expression per row. DuckDB side reads the
    * same fields with its native JSON functions. */
  val q61 = QueryDef.sql("q61_variant_json",
    """SELECT event_type,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
      |  CAST(MIN(CAST(json_extract(props, '$.k') AS INTEGER)) AS INTEGER) AS min_k,
      |  CAST(MAX(CAST(json_extract(props, '$.k') AS INTEGER)) AS INTEGER) AS max_k,
      |  COUNT(DISTINCT CAST(json_extract(props, '$.k') AS INTEGER)) AS distinct_k
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    val v = T.events(s, d)
      .select(col("event_type"), parse_json(col("props")).as("pv"))
      .select(col("event_type"),
        variant_get(col("pv"), "$.k", "int").as("k"))
    v.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("k").cast("long")).as("sum_k"),
        min("k").as("min_k"),
        max("k").as("max_k"),
        countDistinct("k").as("distinct_k"))
      .orderBy("event_type")
  }

  /** q26 — math functions: histogram of price magnitude. */
  val q26 = QueryDef.sql("q26_math_histogram",
    """SELECT CAST(floor(o_totalprice / 50000e0) AS BIGINT) AS bucket,
      |       COUNT(*) AS n,
      |       min(o_totalprice) AS min_p, max(o_totalprice) AS max_p,
      |       CAST(min(o_orderkey) % 7 AS BIGINT) AS mod_check
      |FROM orders
      |GROUP BY 1
      |ORDER BY bucket""".stripMargin) { (s, d) =>
    T.orders(s, d)
      .groupBy(floor(col("o_totalprice") / 50000.0).as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("o_totalprice")).as("min_p"), max(col("o_totalprice")).as("max_p"),
        (min(col("o_orderkey")) % 7).as("mod_check"))
      .orderBy("bucket")
  }

  /** q27 — scalar subquery: customers above the global mean balance
    * (threshold computed exactly so membership is engine-stable). */
  val q27 = QueryDef.sql("q27_above_avg_customers",
    """SELECT c_custkey, c_name, c_acctbal
      |FROM customer
      |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
      |                   FROM customer)
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    val c = T.customer(s, d)
    val thr = c.agg((dsum(col("c_acctbal")) / count(lit(1))).as("thr"))
    c.crossJoin(broadcast(thr))
      .filter(col("c_acctbal") > col("thr"))
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy("c_custkey")
  }

  /** q28 — semi join through a filtered fact: suppliers shipping
    * large parts (EXISTS over lineitem⋈part). */
  val q28 = QueryDef.sql("q28_large_part_suppliers",
    """SELECT s_suppkey, s_name
      |FROM supplier sp
      |WHERE EXISTS (
      |  SELECT 1 FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |  WHERE p.p_size > 40 AND l.l_suppkey = sp.s_suppkey)
      |ORDER BY s_suppkey""".stripMargin) { (s, d) =>
    val sp = T.supplier(s, d)
    val p = T.part(s, d).filter(col("p_size") > 40)
    val l = T.lineitem(s, d)
    val shipped = l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .select("l_suppkey")
    sp.join(shipped, sp("s_suppkey") === shipped("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name")
      .orderBy("s_suppkey")
  }

  /** q29 — IN subquery: order status mix of the top-10 richest customers. */
  val q29 = QueryDef.sql("q29_vip_order_mix",
    """SELECT o_orderstatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders
      |WHERE o_custkey IN (
      |  SELECT c_custkey FROM customer ORDER BY c_acctbal DESC, c_custkey LIMIT 10)
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
    val vip = T.customer(s, d)
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
      .limit(10).select("c_custkey")
    val o = T.orders(s, d)
    o.join(broadcast(vip), o("o_custkey") === vip("c_custkey"), "left_semi")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .orderBy("o_orderstatus")
  }

  /** q66 — ordered-set aggregates (SQL:2008 WITHIN GROUP syntax, in
    * Spark since 4.0): listagg with a pinned ORDER BY — the only
    * deterministic form; an unordered listagg is partition-order
    * nondeterministic and would never hash-match — plus
    * percentile_disc, which returns an ACTUAL element (exact at any
    * scale, unlike the interpolating percentile_cont whose float
    * blend is engine-ordered). Grouped on nation→region: 5 rows out,
    * one tiny shuffle; the sort inside each group is size-bounded by
    * the group. */
  val q66 = QueryDef.sql("q66_ordered_set_aggs",
    """SELECT r.r_name,
      |  COUNT(*) AS n_nations,
      |  string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations,
      |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n.n_nationkey) AS BIGINT)
      |    AS median_key
      |FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
      |GROUP BY r.r_name
      |ORDER BY r.r_name""".stripMargin) { (s, d) =>
    val n = T.nation(s, d)
    val r = T.region(s, d)
    n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy("r_name")
      .agg(
        count(lit(1)).as("n_nations"),
        expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)").as("nations"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY n_nationkey)")
          .cast("long").as("median_key"))
      .orderBy("r_name")
  }

  /** q71 — corrupt-record-tolerant JSON ingestion: the permissive-mode
    * contract every real feed needs (q25/q35/q59/q61 all assume clean
    * JSON). A deterministic seventh of the rows is malformed by
    * prepending '{' (invalid from the first token — no parser
    * ambiguity about trailing data), then parsed with
    * mode=PERMISSIVE + columnNameOfCorruptRecord, the Spark idiom
    * that quarantines bad rows into a column instead of failing the
    * job or silently dropping them. The oracle knows EXACTLY which
    * rows were injected, so the compared columns prove the parser
    * flagged all of them and none of the clean ones — a parser that
    * leniently accepts the broken rows (or chokes on a good one)
    * hash-mismatches. Stateless row-local transform: scales as a
    * narrow map, corrupt quarantine adds zero shuffles. */
  val q71 = QueryDef.sql("q71_corrupt_json_handling",
    """SELECT COUNT(*) AS n_total,
      |  CAST(SUM(CASE WHEN event_id % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
      |  CAST(SUM(CASE WHEN event_id % 7 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
      |  CAST(SUM(CASE WHEN event_id % 7 <> 0
      |           THEN CAST(json_extract(props, '$.k') AS INTEGER) END) AS BIGINT) AS sum_k
      |FROM events""".stripMargin) { (s, d) =>
    val withJson = T.events(s, d)
      .withColumn("js", when(col("event_id") % 7 === 0,
        concat(lit("{"), col("props"))).otherwise(col("props")))
    withJson
      .select(from_json(col("js"), "k INT, _corrupt_record STRING",
        java.util.Map.of("mode", "PERMISSIVE",
          "columnNameOfCorruptRecord", "_corrupt_record")).as("p"))
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("p._corrupt_record").isNotNull, 1).otherwise(0))
          .as("n_corrupt"),
        sum(when(col("p._corrupt_record").isNull, 1).otherwise(0))
          .as("n_valid"),
        sum(when(col("p._corrupt_record").isNull, col("p.k"))).cast("long")
          .as("sum_k"))
  }

  val defs: Seq[QueryDef] =
    Seq(q22, q23, q24, q25, q26, q27, q28, q29, q61, q66, q71)
}
