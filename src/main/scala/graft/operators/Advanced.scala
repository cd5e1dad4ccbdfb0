package graft.operators

import graft.{QueryDef, Tables => T}
import graft.functions.{ExactAgg, PolyHash}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Advanced composition surface: as-of/attribution join, ordered string
  * aggregation, exact percentiles, and a native codegen'd expression.
  */
object Advanced {

  /** q30 — as-of attribution: each purchase event attributed to the
    * user's most recent preceding click. Composed from a forward-filled
    * window (one shuffle by user_id) instead of an inequality join —
    * the scale-correct form of an AS-OF join when both sides share a
    * partition key. */
  val q30 = QueryDef.sql("q30_asof_attribution",
    """SELECT event_id, user_id,
      |  epoch_us(CAST(ts AS TIMESTAMP)) - last_click_us AS gap_us
      |FROM (
      |  SELECT event_id, user_id, ts, event_type,
      |    last_value(CASE WHEN event_type = 'click'
      |                    THEN epoch_us(CAST(ts AS TIMESTAMP)) END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_us
      |  FROM events) t
      |WHERE event_type = 'purchase'
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    T.events(s, d)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("last_click_us",
        last(when(col("event_type") === "click", col("us")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        (col("us") - col("last_click_us")).as("gap_us"))
      .orderBy("event_id")
  }

  /** q31 — ordered string aggregation: deterministic via sort-then-join
    * (Spark's collect_set order is undefined; array_sort pins it). */
  val q31 = QueryDef.sql("q31_segment_nations",
    """SELECT c_mktsegment,
      |  array_to_string(list_sort(list(DISTINCT n_name)), ',') AS nations,
      |  COUNT(*) AS n_customers
      |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
    val c = T.customer(s, d)
    val n = T.nation(s, d)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy("c_mktsegment")
      .agg(array_join(array_sort(collect_set(col("n_name"))), ",").as("nations"),
        count(lit(1)).as("n_customers"))
      .orderBy("c_mktsegment")
  }

  /** q32 — the native PolyHash expression (rolling-hash fingerprint,
    * whole-stage-codegen'd; oracle recomputes the identical recurrence
    * via list_reduce). */
  val q32 = QueryDef.sql("q32_rolling_hash",
    """SELECT doc_id,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    list_transform(string_split(text, ''), c -> CAST(ord(c) AS BIGINT))),
      |    (acc, x) -> (acc * 31 + x) % 2147483647) AS fp
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    PolyHash.register(s)
    T.documents(s, d)
      .select(col("doc_id"), expr("poly_hash(text)").as("fp"))
      .orderBy("doc_id")
  }

  /** q33 — exact interpolated percentiles of order value per status. */
  val q33 = QueryDef.sql("q33_percentiles",
    """SELECT o_orderstatus,
      |  quantile_cont(o_totalprice, 0.25) AS p25,
      |  quantile_cont(o_totalprice, 0.5) AS p50,
      |  quantile_cont(o_totalprice, 0.75) AS p75,
      |  COUNT(*) AS n
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
    // stats-chosen shape (ExactPercentile.smallInput, free plan-stats
    // probe): small inputs keep the one-pass builtin aggregate; past
    // the ceiling the histogram + distributed prefix-sum selection
    // takes over — the builtin's aggregation buffer holds every
    // (value, count) of a group, so a hot group at 100 TB is an
    // executor OOM, and even sf1's three near-unique-valued groups
    // cost ~10 s of buffer build+merge (vs ~2.6 s for the histogram
    // shape). Interpolation is spec-pinned bit-identical between the
    // paths, so the dial can never move the oracle hash. n = COUNT(*)
    // on BOTH paths (r11 ADVICE #3: the scale path used the non-null
    // count and dropped all-NULL groups — divergent if o_totalprice
    // ever admits NULLs at scale).
    val o = T.orders(s, d)
    if (ExactPercentile.smallInput(o))
      o.groupBy("o_orderstatus")
        .agg(
          expr("percentile(o_totalprice, 0.25)").as("p25"),
          expr("percentile(o_totalprice, 0.5)").as("p50"),
          expr("percentile(o_totalprice, 0.75)").as("p75"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus")
    else
      ExactPercentile.byGroup(o, "o_orderstatus", "o_totalprice",
          Seq(0.25, 0.5, 0.75))
        .groupBy("o_orderstatus")
        .agg(
          max(when(col("p") === 0.25, col("value"))).as("p25"),
          max(when(col("p") === 0.5, col("value"))).as("p50"),
          max(when(col("p") === 0.75, col("value"))).as("p75"),
          first("n").as("n"))
        .orderBy("o_orderstatus")
  }

  /** q51 — theta (range) join: orders banded into value tiers via a
    * non-equi join against a tiny boundary table. Plans as a
    * BroadcastNestedLoopJoin — correct for a small build side; at scale
    * a range join prefers bucketized boundaries (turn the theta join
    * into an equi join on floor(value/step)). */
  val q51 = QueryDef.sql("q51_theta_range_join",
    """SELECT tier, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders
      |JOIN (VALUES ('bronze', 0e0, 100000e0),
      |             ('silver', 100000e0, 300000e0),
      |             ('gold', 300000e0, 1000000000e0)) t(tier, lo, hi)
      |  ON o_totalprice >= lo AND o_totalprice < hi
      |GROUP BY tier
      |ORDER BY tier""".stripMargin) { (s, d) =>
    import s.implicits._
    val tiers = Seq(
      ("bronze", 0.0, 100000.0),
      ("silver", 100000.0, 300000.0),
      ("gold", 300000.0, 1e9)).toDF("tier", "lo", "hi")
    T.orders(s, d)
      .join(broadcast(tiers),
        col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy("tier")
      .agg(count(lit(1)).as("n"), ExactAgg.dsum(col("o_totalprice")).as("total"))
      .orderBy("tier")
  }

  /** q52 — native top-k-per-key aggregate (TypedImperativeAggregate):
    * map-side partial top-k instead of the window form's full per-key
    * sort (cf. q11, which computes the same answer the windowed way).
    * The oracle is the ordered-list-slice form. Output joined to a
    * string (array cells break the driver's pandas sort). */
  val q52 = QueryDef.sql("q52_topk_aggregate",
    """SELECT o_custkey,
      |  array_to_string((list(o_orderkey ORDER BY o_totalprice DESC, o_orderkey))[1:3], ',') AS top_orders
      |FROM orders
      |GROUP BY o_custkey
      |ORDER BY o_custkey""".stripMargin) { (s, d) =>
    graft.functions.TopKIds.register(s)
    T.orders(s, d)
      .groupBy("o_custkey")
      .agg(array_join(
        expr("top_k_ids(o_totalprice, o_orderkey, 3)").cast("array<string>"),
        ",").as("top_orders"))
      .orderBy("o_custkey")
  }

  /** q57 — sketch vs exact percentile: approx_percentile (Spark KLL /
    * DuckDB t-digest) checked against the exact interpolated quantile.
    * The sketches are engine-defined, so the oracled columns are the
    * exact values plus a BOOLEAN "approx within 2% of exact" — true in
    * both engines when the sketches behave, and a correctness alarm
    * when either engine's sketch drifts. This is the sketch-family
    * pattern that scales: exact percentile needs a full sort per group;
    * the sketch is one pass + constant memory, and this query bounds
    * its error against the exact answer. */
  val q57 = QueryDef.sql("q57_approx_percentile",
    """SELECT o_orderstatus,
      |  quantile_cont(o_totalprice, 0.5) AS p50_exact,
      |  quantile_cont(o_totalprice, 0.9) AS p90_exact,
      |  (abs(approx_quantile(o_totalprice, 0.5) - quantile_cont(o_totalprice, 0.5))
      |     <= 0.02e0 * quantile_cont(o_totalprice, 0.5)) AS p50_approx_ok,
      |  (abs(approx_quantile(o_totalprice, 0.9) - quantile_cont(o_totalprice, 0.9))
      |     <= 0.02e0 * quantile_cont(o_totalprice, 0.9)) AS p90_approx_ok,
      |  COUNT(*) AS n
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
    // stats-chosen like q33: small inputs keep the original one-pass
    // aggregate; past the ceiling the EXACT side goes through the
    // histogram + prefix-sum selection (the builtin's per-group buffer
    // is the very scale hazard the sketch exists to avoid — the exact
    // reference computation should not itself carry it) while the
    // sketch side stays a one-pass constant-memory aggregate, joined
    // on the 3-row group key
    val o = T.orders(s, d)
    val wide = if (ExactPercentile.smallInput(o))
      o.groupBy("o_orderstatus")
        .agg(
          expr("percentile(o_totalprice, 0.5)").as("p50_exact"),
          expr("percentile(o_totalprice, 0.9)").as("p90_exact"),
          expr("approx_percentile(o_totalprice, 0.5, 10000)").as("p50_approx"),
          expr("approx_percentile(o_totalprice, 0.9, 10000)").as("p90_approx"),
          count(lit(1)).as("n"))
    else {
      val ex = ExactPercentile.byGroup(o, "o_orderstatus", "o_totalprice",
          Seq(0.5, 0.9))
        .groupBy("o_orderstatus")
        .agg(
          max(when(col("p") === 0.5, col("value"))).as("p50_exact"),
          max(when(col("p") === 0.9, col("value"))).as("p90_exact"),
          first("n").as("n"))
      val ap = o.groupBy("o_orderstatus")
        .agg(
          expr("approx_percentile(o_totalprice, 0.5, 10000)").as("p50_approx"),
          expr("approx_percentile(o_totalprice, 0.9, 10000)").as("p90_approx"))
      ex.join(ap, "o_orderstatus")
    }
    wide
      .select(col("o_orderstatus"), col("p50_exact"), col("p90_exact"),
        (abs(col("p50_approx") - col("p50_exact")) <= col("p50_exact") * 0.02)
          .as("p50_approx_ok"),
        (abs(col("p90_approx") - col("p90_exact")) <= col("p90_exact") * 0.02)
          .as("p90_approx_ok"),
        col("n"))
      .orderBy("o_orderstatus")
  }

  /** q58 — the bucketized form of q51's range join (the scale path its
    * Scaladoc documents): values are bucketed by floor(value/step) and
    * each tier expands to its covered bucket ids, turning the theta join
    * into a broadcast EQUI join — no BroadcastNestedLoopJoin, and at
    * 100 TB the bucket id is an honest shuffle/partition key. A residual
    * range predicate keeps it correct even when tier boundaries don't
    * align with bucket boundaries. Oracle: q51's SQL — same answer by
    * construction. */
  val q58 = QueryDef.sql("q58_bucketized_range_join", q51.oracle.get) { (s, d) =>
    import s.implicits._
    val step = 100000.0
    val o = T.orders(s, d)
      .withColumn("bkt", floor(col("o_totalprice") / step).cast("long"))
    // bucket table sized by the data's actual max (one scalar aggregate,
    // the usual physical-design pass), not the tier's open upper bound
    val maxBkt = Option(o.agg(max("bkt")).first().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    val tiers = Seq(
      ("bronze", 0.0, 100000.0),
      ("silver", 100000.0, 300000.0),
      ("gold", 300000.0, 1e9))
    val buckets = tiers.flatMap { case (t, lo, hi) =>
      val bLo = math.floor(lo / step).toLong
      val bHi = math.min(maxBkt, math.ceil(hi / step).toLong - 1)
      (bLo to bHi).map(b => (t, b, lo, hi))
    }.toDF("tier", "bkt", "lo", "hi")
    o.join(broadcast(buckets), Seq("bkt"))
      .filter(col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy("tier")
      .agg(count(lit(1)).as("n"), ExactAgg.dsum(col("o_totalprice")).as("total"))
      .orderBy("tier")
  }

  val defs: Seq[QueryDef] = Seq(q30, q31, q32, q33, q51, q52, q57, q58)
}
