package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.{Tables => T}

/** Round-by-round convergence profile of gr02's connected-components
  * fixpoint (r8 verdict item #4): prints per-round changed-label counts
  * for candidate (jumpAfter, checkEvery) dials plus wall time, so the
  * dial choice is measured, not guessed.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.ProbeCc"
  */
object ProbeCc {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val pairs = T.orders(spark, sfDir)
      .filter(col("o_totalprice") >= 498000.0)
      .join(T.lineitem(spark, sfDir), col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("da"),
        (col("l_suppkey") * 2 + 1).as("db"))
      .distinct().cache()
    println(s"[cc-probe] edges=${pairs.count()}")

    for ((ja, ce) <- Seq((64, 1), (0, 1), (0, 2), (0, 3))) {
      val t0 = System.nanoTime()
      val lab = Dedup.connectedComponents(pairs, jumpAfter = ja, checkEvery = ce)
      val n = lab.count()
      println(f"[cc-probe] jumpAfter=$ja checkEvery=$ce nodes=$n  ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
