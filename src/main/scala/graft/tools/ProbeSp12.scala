package graft.tools

import org.apache.spark.sql.SparkSession

/** sp12 plan + solo-cold wall probe: dumps the fused admission chain's
  * executed plan (the frame PlanShapeSpec locks) and times the full
  * pipeline cold on any fixture dir — the measured leg for the fused
  * multimodal curation pipeline (r15 verdict #5).
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.ProbeSp12"
  */
object ProbeSp12 {
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

    if (args.contains("plan") || sys.env.contains("SPARK_GRAFT_SP12_PLAN")) {
      val adm = graft.multimodal.Multimodal.multimodalAdmitted(spark, sfDir)
      println("[sp12-probe] admission chain executed plan:")
      println(adm.queryExecution.executedPlan.toString)
    }
    // the COLD wall of the full fused pipeline comes first — the
    // accounting below re-evaluates stages and would otherwise warm
    // shuffle files / code caches under the timed run
    val t0 = System.nanoTime()
    val n = graft.multimodal.Multimodal.sp12.fn(spark, sfDir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    // candidate/bin accounting (r16 verdict #2 — the ProbeMm07
    // precedent): the numbers that must stay ~linear in corpus size
    val parts = graft.multimodal.Multimodal.multimodalParts(spark, sfDir)
    val cand = parts.pairs.count()
    val admitted = parts.admitted.count()
    println(f"[sp12-probe] dir=$sfDir%-16s n_elig=${parts.nAll}%8d " +
      f"r=${parts.r}%2d cand_pairs=$cand%10d admitted=$admitted%8d " +
      f"bins=$n%6d cold=$wall%7.2f s")
    spark.stop()
  }
}
