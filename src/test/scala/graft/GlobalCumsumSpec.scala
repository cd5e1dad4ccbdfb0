package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GlobalCumsumSpec extends AnyFunSuite {
  import TestSpark._

  test("withRunningSum equals SUM OVER and ignores partitioning") {
    import spark.implicits._
    val base = (1 to 499).map(i => ((i * 7919) % 100, i.toLong, ((i * 31) % 17).toLong))
      .toDF("v", "id", "x")
    val order = Seq(col("v"), col("id"))

    val viaWindow = base
      .withColumn("cum", sum("x").over(
        Window.orderBy("v", "id").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(3)).toMap

    Seq(base, base.repartition(7), base.repartition(1), base.orderBy(col("id").desc))
      .foreach { df =>
        val got = GlobalCumsum.withRunningSum(df, order, "x", "cum")
          .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(3)).toMap
        assert(got == viaWindow, "running sum must match the window form")
      }

    // final value = grand total
    val last = GlobalCumsum.withRunningSum(base, order, "x", "cum")
      .agg(max("cum")).head().getLong(0)
    val total = base.agg(sum("x")).head().getLong(0)
    assert(last == total)
  }

  test("degenerate inputs: empty and single-row frames") {
    import spark.implicits._
    val empty = Seq.empty[(Int, Long, Long)].toDF("v", "id", "x")
    assert(GlobalCumsum.withRunningSum(empty, Seq(col("v")), "x", "cum")
      .count() == 0)
    assert(GlobalIndex.withGlobalIndex(empty, Seq(col("v")), "idx")
      .count() == 0)
    val one = Seq((1, 1L, 7L)).toDF("v", "id", "x")
    val c = GlobalCumsum.withRunningSum(one, Seq(col("v")), "x", "cum")
      .head()
    assert(c.getLong(3) == 7L)
    val i = GlobalIndex.withGlobalIndex(one, Seq(col("v")), "idx").head()
    assert(i.getLong(3) == 0L)
  }

  test("ExactPercentile.byGroup is bit-identical to the builtin percentile") {
    import spark.implicits._
    // heavy duplication AND near-unique values, plus a fractional-
    // position group size — the interpolation corners; values chosen so
    // p*(n-1) is non-integral for most (group, p)
    val df = ((1 to 997).map(i => ("a", (i % 211) * 0.37 + 100.0)) ++
      (1 to 500).map(i => ("b", i * 1.01)) ++
      Seq(("c", 42.0)) ++
      (1 to 4).map(i => ("d", i * 2.5))).toDF("g", "x")
    val ps = Seq(0.25, 0.5, 0.75, 0.9, 0.013)
    val pCols = ps.map(p => expr(s"percentile(x, $p)").as(s"p$p"))
    val builtin = df.groupBy("g")
      .agg(pCols.head, pCols.tail: _*)
      .collect()
      .flatMap(r => ps.zipWithIndex.map { case (p, i) =>
        (r.getString(0), p) -> r.getDouble(i + 1) })
      .toMap
    // BOTH paths of the stats-chosen split must be bit-identical to the
    // builtin — the dial can then never move an oracle hash
    for (path <- Seq(
        operators.ExactPercentile.byGroupHistogram(df, "g", "x", ps),
        operators.ExactPercentile.byGroupBuiltin(df, "g", "x", ps))) {
      val got = path.collect()
        .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
      assert(got.keySet == builtin.keySet)
      got.foreach { case (k, v) =>
        // BIT equality, not tolerance — the shapes must be
        // interchangeable under the driver's hash compare
        assert(java.lang.Double.doubleToLongBits(v) ==
          java.lang.Double.doubleToLongBits(builtin(k)),
          s"$k: got $v builtin ${builtin(k)}")
      }
      // n column: COUNT(*) per group (no NULLs in this fixture)
      val ns = path.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
      assert(ns == Map("a" -> 997L, "b" -> 500L, "c" -> 1L, "d" -> 4L))
    }
  }

  test("byGroup NULL semantics: all-NULL groups survive, n is COUNT(*)") {
    // r11 ADVICE #3: the histogram path filtered NULLs, so an all-NULL
    // group vanished and n was the non-null count, while the builtin
    // path kept the group with a NULL percentile and counted all rows —
    // the stats dial could then move results if the column admits NULLs.
    import spark.implicits._
    val df = Seq[(String, java.lang.Double)](
      ("a", 1.0), ("a", 3.0), ("a", null), // mixed: percentile over {1,3}
      ("e", null), ("e", null),            // all-NULL group
      (null, 10.0), (null, 20.0)           // NULL group KEY, real values
    ).toDF("g", "x")
    val ps = Seq(0.5)
    for (path <- Seq(
        operators.ExactPercentile.byGroupHistogram(df, "g", "x", ps),
        operators.ExactPercentile.byGroupBuiltin(df, "g", "x", ps))) {
      val rows = path.collect()
        .map(r => Option(r.getString(0)) ->
          (if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getLong(3)))
        .toMap
      assert(rows == Map(
        Some("a") -> (Some(2.0), 3L), // NULL ignored for rank, counted in n
        Some("e") -> (None, 2L),      // group kept, NULL value, true count
        // NULL group key computes a real percentile (r12 ADVICE #1: the
        // non-null-safe === joins dropped it to NULL on the histogram
        // path only — a dial-dependent divergence)
        None -> (Some(15.0), 2L)),
        s"got $rows")
    }
  }
}
