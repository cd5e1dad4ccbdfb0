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
}
