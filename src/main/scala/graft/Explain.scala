package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan of selected queries
  * so scan pushdown (PushedFilters/ReadSchema), join strategies
  * (BroadcastHashJoin vs SortMergeJoin), and WholeStageCodegen coverage
  * can be reviewed. Usage: runMain graft.Explain [sfDir] [name...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("q01_pricing_summary", "q03_revenue_by_customer",
        "q05_local_supplier_revenue", "q19_cohort_symmetric_diff",
        "dd02_ngram_jaccard", "ss01_cosine_topk",
        // round-3 surface: banded LSH, window-free cumsum, pruned
        // sampling, broadcast-asymmetric decontamination, variant
        "dd07_embedding_neardup", "sp01_token_budget",
        "sp02_stratified_sample", "dd09_benchmark_decontamination",
        "q61_variant_json",
        // round-5 surface: injected runtime bloom filter, z-clustered
        // round-trip, window-free terciles
        "q69_bloom_runtime_filter", "q70_zorder_clustering",
        "ta14_quality_buckets")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // match Bench/Verify's scan-split sizing so audited plans are
      // the shipped plans (r18)
      .config("spark.sql.files.openCostInBytes",
        sys.env.getOrElse("SPARK_GRAFT_OPEN_COST", "65536"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
