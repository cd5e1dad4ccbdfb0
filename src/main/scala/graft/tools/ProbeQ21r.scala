package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B/C for q21r's sf1 shape (r10 verdict item #4 of the plan audit,
  * carried from r9): three exact count-distincts + two HLL estimates
  * over DIFFERENT lineitem columns.
  *
  *  A — shipped shape: one aggregate per column, crossJoined (3
  *      sequential scans; the r2 fix for the 13 s N-way Expand).
  *  B — single Aggregate with all five aggs (Catalyst plans an N-way
  *      Expand: every input row is replicated once per distinct-column
  *      class before the partial dedup).
  *  C — manual unpivot: ONE scan, inline posexplode to (gid, v) — 3×
  *      rows but only the two needed ints wide — partial-dedup
  *      groupBy(gid, v), then per-gid exact count + HLL over the
  *      deduped values (HLL of distinct values == HLL of raw values),
  *      conditional-agg pivot back to one row.
  *
  * Run: SPARK_GRAFT_SF_DIR=/tmp/sf1 sbt "runMain graft.tools.ProbeQ21r"
  */
object ProbeQ21r {
  private def shapeA(s: SparkSession, d: String): DataFrame = {
    // the pre-r11 shipped shape, inlined (q21r now ships shape C)
    val li = graft.Tables.lineitem(s, d)
    val parts = li.agg(
      countDistinct(col("l_partkey")).as("exact_parts"),
      approx_count_distinct(col("l_partkey"), 0.01).as("ap"))
    val orders = li.agg(
      countDistinct(col("l_orderkey")).as("exact_orders"),
      approx_count_distinct(col("l_orderkey"), 0.01).as("ao"))
    val supps = li.agg(countDistinct(col("l_suppkey")).as("exact_supps"))
    parts.crossJoin(orders).crossJoin(supps)
      .select(col("exact_parts"), col("exact_orders"), col("exact_supps"),
        (abs(col("ap") - col("exact_parts")) <= col("exact_parts") * 0.05)
          .as("approx_parts_ok"),
        (abs(col("ao") - col("exact_orders")) <= col("exact_orders") * 0.05)
          .as("approx_orders_ok"))
  }

  private def shapeB(s: SparkSession, d: String): DataFrame = {
    val li = graft.Tables.lineitem(s, d)
    li.agg(
      countDistinct(col("l_partkey")).as("exact_parts"),
      countDistinct(col("l_orderkey")).as("exact_orders"),
      countDistinct(col("l_suppkey")).as("exact_supps"),
      approx_count_distinct(col("l_partkey"), 0.01).as("ap"),
      approx_count_distinct(col("l_orderkey"), 0.01).as("ao"))
      .select(col("exact_parts"), col("exact_orders"), col("exact_supps"),
        (abs(col("ap") - col("exact_parts")) <= col("exact_parts") * 0.05)
          .as("approx_parts_ok"),
        (abs(col("ao") - col("exact_orders")) <= col("exact_orders") * 0.05)
          .as("approx_orders_ok"))
  }

  private def shapeC(s: SparkSession, d: String): DataFrame = {
    val li = graft.Tables.lineitem(s, d)
    val unp = li.select(posexplode(array(
      col("l_partkey").cast("long"), col("l_orderkey").cast("long"),
      col("l_suppkey").cast("long"))).as(Seq("gid", "v")))
    val per = unp.groupBy("gid", "v").agg(count(lit(1)).as("_n"))
      .groupBy("gid").agg(
        count(lit(1)).as("exact"),
        approx_count_distinct(col("v"), 0.01).as("approx"))
    per.agg(
      max(when(col("gid") === 0, col("exact"))).as("exact_parts"),
      max(when(col("gid") === 1, col("exact"))).as("exact_orders"),
      max(when(col("gid") === 2, col("exact"))).as("exact_supps"),
      max(when(col("gid") === 0, col("approx"))).as("ap"),
      max(when(col("gid") === 1, col("approx"))).as("ao"))
      .select(col("exact_parts"), col("exact_orders"), col("exact_supps"),
        (abs(col("ap") - col("exact_parts")) <= col("exact_parts") * 0.05)
          .as("approx_parts_ok"),
        (abs(col("ao") - col("exact_orders")) <= col("exact_orders") * 0.05)
          .as("approx_orders_ok"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val s = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s.range(100000).selectExpr("sum(id)").collect() // JVM warmup
    val shapes = Seq[(String, (SparkSession, String) => DataFrame)](
      "A-crossJoin3" -> shapeA, "B-expand" -> shapeB, "C-unpivot" -> shapeC,
      "D-shipped" -> ((s, d) => graft.SparkEntry.queries("q21r_approx_distinct")(s, d)))
    // parity first: all three must produce identical rows
    val rows = shapes.map { case (n, f) => n -> f(s, sfDir).collect().toSeq }
    rows.sliding(2).foreach { case Seq((na, a), (nb, b)) =>
      require(a == b, s"MISMATCH $na=$a vs $nb=$b")
      println(s"parity ok: $na == $nb")
    }
    for (round <- 1 to 2; (n, f) <- shapes) {
      val t0 = System.nanoTime()
      f(s, sfDir).write.format("noop").mode("overwrite").save()
      println(f"round $round $n%-14s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
  }
}
