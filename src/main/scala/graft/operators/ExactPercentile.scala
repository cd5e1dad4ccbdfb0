package graft.operators

import graft.GlobalCumsum
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact interpolated per-group percentiles WITHOUT the builtin
  * `percentile` aggregate's memory shape.
  *
  * Spark's exact `percentile` buffers every (value, count) of a group
  * inside one aggregation buffer — at 100 TB a single hot group is an
  * executor OOM, and even at sf1 the three near-unique-valued orders
  * groups cost ~10 s of buffer build + merge. The scale-correct shape
  * is the classic histogram + prefix-sum selection:
  *
  *   1. groupBy(group, value) count — map-side combine, the shuffle
  *      carries only distinct (group, value) pairs;
  *   2. one distributed range sort by (group, value) + the two-pass
  *      [[GlobalCumsum]] running count (never a one-partition window);
  *   3. each percentile's target rank positions (floor/ceil of
  *      p·(n−1), 0-based within the group) land in bracketing rows
  *      found by a BROADCAST join of the tiny (group × p) target table
  *      against the histogram's coverage intervals — no row of the
  *      histogram is ever wider than (group, value, cnt, cum).
  *
  * Interpolation reproduces the builtin bit-for-bit:
  * (higher − pos)·v_lo + (pos − lower)·v_hi with pos = p·(n−1)
  * (`Percentile.getPercentile`'s exact expression — NOT the
  * algebraically-equal v_lo + frac·(v_hi − v_lo), which can differ in
  * the last ulp), so swapping shapes can never move an oracle hash.
  * The equivalence is spec-pinned against the builtin
  * (GlobalCumsumSpec).
  */
object ExactPercentile {

  /** Stats-chosen escape hatch (the LocalCcMaxEdges / SetsBroadcastBytes
    * pattern): at or below this input size the builtin's per-group
    * buffers provably fit in any executor and the histogram shape's
    * extra jobs (GlobalCumsum's per-partition-sums collect + checkpoint)
    * are pure scheduler floor — measured 0.8 s builtin vs 1.3 s
    * histogram on 2.7 MB of orders (sf0.1) but 9.9 s vs 2.6 s on 26 MB
    * (sf1). Read from the optimized plan's sizeInBytes — free, no
    * action. The shapes are spec-pinned bit-identical
    * (GlobalCumsumSpec), so where the dial lands can never move an
    * oracle hash. */
  private[graft] val BuiltinMaxBytes = 8L << 20

  /** True when `df`'s plan-stats size is at or under the builtin
    * ceiling — callers keep their one-pass builtin aggregate there. */
  def smallInput(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.stats.sizeInBytes <= BuiltinMaxBytes

  /** One row per (group, percentile): `(groupCol, p, value, n)` via the
    * scale shape. `ps` must be non-empty. NULL values are ignored for
    * the percentile like the builtin, but `n` is COUNT(*) and every
    * group keeps its rows — an all-NULL group yields a NULL value with
    * its true row count, matching the small-input one-pass form the
    * q33/q57 dial would otherwise diverge from (r11 ADVICE #3). */
  def byGroup(df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty)
    byGroupHistogram(df, groupCol, valueCol, ps)
  }

  /** The builtin aggregate reshaped to byGroup's (group, p, value, n)
    * long format — the spec's bit-parity twin. */
  private[graft] def byGroupBuiltin(df: DataFrame, groupCol: String,
      valueCol: String, ps: Seq[Double]): DataFrame = {
    val pCols = ps.zipWithIndex.map { case (p, i) =>
      expr(s"percentile(CAST($valueCol AS DOUBLE), ${p}D)").as(s"_v$i")
    } :+ count(lit(1)).as("n")
    val wide = df.groupBy(col(groupCol))
      .agg(pCols.head, pCols.tail: _*)
    val spark = df.sparkSession
    import spark.implicits._
    wide.join(broadcast(ps.zipWithIndex.toDF("p", "i")), lit(true))
      .select(col(groupCol), col("p"),
        ps.indices.foldLeft(lit(null).cast("double")) { (acc, i) =>
          when(col("i") === i, col(s"_v$i")).otherwise(acc)
        }.as("value"),
        col("n"))
  }

  /** Scale path: histogram + prefix-sum selection. */
  private[graft] def byGroupHistogram(df: DataFrame, groupCol: String,
      valueCol: String, ps: Seq[Double]): DataFrame = {
    val spark = df.sparkSession
    val hist = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("g"), col(valueCol).cast("double").as("v"))
      .agg(count(lit(1)).as("cnt"))
    val cum = GlobalCumsum.withRunningSum(
      hist, Seq(col("g"), col("v")), "cnt", "cum")
    // per-group size and global offset: cum at group end − group size
    // = total count of all groups sorted before this one
    val totals = cum.groupBy("g")
      .agg(max("cum").as("end_cum"), sum("cnt").as("n"))
      .select(col("g"), col("n"), (col("end_cum") - col("n")).as("off"))
    import spark.implicits._
    val psDf = ps.toDF("p")
    // target global 0-based positions for each (group, p)
    val targets = totals.crossJoin(psDf)
      .withColumn("pos", col("p") * (col("n") - 1).cast("double"))
      .withColumn("lower", floor(col("pos")).cast("long"))
      .withColumn("higher", ceil(col("pos")).cast("long"))
      .withColumn("glo", col("off") + col("lower"))
      .withColumn("ghi", col("off") + col("higher"))
      .select(col("g").as("tg"), col("p"), col("pos"),
        col("lower"), col("higher"), col("glo"), col("ghi"), col("n"))
    // histogram row covers global 0-based positions [cum−cnt, cum−1]
    val lo = col("cum") - col("cnt")
    val coversLo = lo <= col("glo") && col("glo") <= col("cum") - 1
    val coversHi = lo <= col("ghi") && col("ghi") <= col("cum") - 1
    // null-safe group equality (r12 ADVICE #1): a NULL group key must
    // reach its own targets row, or the histogram path returns NULL
    // percentiles where the builtin path computes real values
    val interp = cum.join(broadcast(targets),
        col("g") <=> col("tg") && (coversLo || coversHi))
      .groupBy(col("g"), col("p"))
      .agg(
        max(when(coversLo, col("v"))).as("vlo"),
        max(when(coversHi, col("v"))).as("vhi"),
        first(col("pos")).as("pos"),
        first(col("lower")).as("lower"),
        first(col("higher")).as("higher"))
      .select(col("g"), col("p"),
        when(col("lower") === col("higher"), col("vlo"))
          .otherwise(
            (col("higher").cast("double") - col("pos")) * col("vlo") +
            (col("pos") - col("lower").cast("double")) * col("vhi"))
          .as("value"))
    // group list + n from the UNFILTERED input (COUNT(*), matching the
    // small-input builtin path's count(lit(1)) — r11 ADVICE #3): an
    // all-NULL group keeps its rows with a NULL percentile instead of
    // vanishing, and n counts NULL values too. One extra map-side-
    // combined groupBy over df; its shuffle carries one row per group
    // per partition. Position math above still uses the NON-NULL count
    // (the builtin's percentile rank semantics).
    val groupsStar = df.groupBy(col(groupCol).as("gs"))
      .agg(count(lit(1)).as("n_star"))
    groupsStar.crossJoin(broadcast(ps.toDF("ps")))
      .join(interp, col("gs") <=> col("g") && col("ps") === col("p"), "left")
      .select(col("gs").as(groupCol), col("ps").as("p"), col("value"),
        col("n_star").as("n"))
  }
}
