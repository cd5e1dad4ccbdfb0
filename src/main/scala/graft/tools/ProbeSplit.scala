package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B probe for scan-split parallelism (optimization guide §2.2/§6.1):
  * the sf fixtures are single parquet files (lineitem sf0.1 = 10.8 MB),
  * and the default `spark.sql.files.openCostInBytes` = 4 MB floors the
  * split size at 4 MB — so a 32-core local session scans lineitem with
  * ~4 tasks and every scan-dominated query leaves 28 cores idle. With a
  * small open cost the split size falls back to bytesPerCore =
  * totalBytes / defaultParallelism, i.e. scan parallelism tracks the
  * core count — the scale-adaptive behavior (at 100 TB bytesPerCore ≫
  * maxPartitionBytes, so the 128 MB cap governs and the knob is inert).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *   sbt 'runMain graft.tools.ProbeSplit q01_pricing_summary ...'
  * Times each named query (min of 3 noop-sink runs) under the default
  * open cost and under 64 KB, printing both and the scan task counts.
  */
object ProbeSplit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q01_pricing_summary", "q03_revenue_by_customer",
        "q49_exact_moment_stats", "gr01_pagerank_authority")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.setCheckpointDir(graft.TempDirs.deleteOnExit("graft_ckpt"))
    // untimed warmup (Bench's own discipline)
    try {
      spark.range(100000).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/region.parquet").count()
    } catch { case _: Throwable => () }

    def time(name: String): Double =
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min

    val results = names.map { n =>
      spark.conf.unset("spark.sql.files.openCostInBytes")
      val base = time(n)
      spark.conf.set("spark.sql.files.openCostInBytes", 65536L)
      val tuned = time(n)
      println(f"[probe-split] $n%-40s default=$base%7.3f s  openCost64k=$tuned%7.3f s  (${100 * (base - tuned) / base}%.0f%% off)")
      (n, base, tuned)
    }
    val scanParts = {
      spark.conf.set("spark.sql.files.openCostInBytes", 65536L)
      val p = spark.read.parquet(s"$sfDir/lineitem.parquet").rdd.getNumPartitions
      spark.conf.unset("spark.sql.files.openCostInBytes")
      val p0 = spark.read.parquet(s"$sfDir/lineitem.parquet").rdd.getNumPartitions
      (p0, p)
    }
    println(s"[probe-split] lineitem scan tasks: default=${scanParts._1} openCost64k=${scanParts._2}")
    println("PROBE_SPLIT: {" + results.map { case (n, b, t) =>
      f""""$n":[$b%.3f,$t%.3f]"""
    }.mkString(",") + "}")
    spark.stop()
  }
}
