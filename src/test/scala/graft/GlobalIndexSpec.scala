package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GlobalIndexSpec extends AnyFunSuite {
  import TestSpark._

  test("withGlobalIndex equals row_number()-1 and ignores partitioning") {
    import spark.implicits._
    val base = (1 to 997).map(i => ((i * 7919) % 1000, i.toLong))
      .toDF("v", "id")
    val order = Seq(col("v"), col("id"))

    val viaWindow = base
      .withColumn("idx", row_number().over(Window.orderBy("v", "id")).cast("long") - 1)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap

    Seq(base, base.repartition(7), base.repartition(1), base.orderBy(col("id").desc))
      .foreach { df =>
        val got = GlobalIndex.withGlobalIndex(df, order, "idx")
          .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
        assert(got == viaWindow, "global index must match the window form")
      }

    // contiguity 0..n-1
    val idxs = GlobalIndex.withGlobalIndex(base, order, "idx")
      .select("idx").collect().map(_.getLong(0)).sorted
    assert(idxs.toSeq == (0L until 997L))
  }
}
