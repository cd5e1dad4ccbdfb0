package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.{Tables => T}

/** Cold-cost measurement of the dd02/dd05 shared Jaccard pair-table
  * build, driving the PRODUCTION entry points themselves
  * (Dedup.shinglesOf + Dedup.jaccardPairsOf — not a mirrored copy, so
  * the probe cannot drift from the engine). Two timed materializations:
  *
  *   1. shingle index — fused shingle_hashes kernel (per-doc distinct
  *      fingerprints, no corpus-wide DISTINCT shuffle) + df≤100 prune;
  *   2. pair table    — PPJoin prefix/length/positional candidates +
  *      stats-chosen broadcast verify with sorted_intersect_count.
  *
  * Their sum is the honest cold cost a first dd02/dd05 query pays
  * before the memo warms (r8: 43.1 s at sf1; r9 target < 30 s).
  *
  * Run: SPARK_GRAFT_SF_DIR=/tmp/sf1 sbt "runMain graft.tools.ProbeDd02"
  */
object ProbeDd02 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](name: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[dd02-probe] $name%-28s $s%8.2f s")
      (r, s)
    }

    val sh = Dedup.shinglesOf(T.documents(spark, sfDir)).cache()
    val (nSh, tSh) = time("1 shingle index (cold)")(sh.count())
    val pairs = Dedup.jaccardPairsOf(sh)
    val (nPairs, tPairs) = time("2 pair table (cand+verify)")(pairs.count())
    println(f"[dd02-probe] TOTAL cold build            ${tSh + tPairs}%8.2f s" +
      f"   (shingles=$nSh%,d pairs>=0.3=$nPairs%,d)")
    spark.stop()
  }
}
