package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** EM-LDA corpus-partition sweep (r17): LdaPipeline coalesces corpora
  * under 100k docs to 8 partitions — measured right for the 51-doc
  * reference corpus (123→74 s at 32→8, r11), but untested between
  * "tiny" and "real scale". This probe trains the ml04 configuration
  * at several partition counts on one fixture dir and prints the
  * iteration sums, so the coalesce rule is a measured curve instead of
  * one point.
  *
  * Run: SPARK_GRAFT_SF_DIR=/tmp/sf1 sbt "runMain graft.tools.ProbeEmParts 8 16 32"
  */
object ProbeEmParts {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val parts = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(8, 16, 32)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.setCheckpointDir(
      graft.TempDirs.deleteOnExit("graft_ckpt"))

    val tokens = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("tokens"))

    parts.foreach { p =>
      val t0 = System.nanoTime()
      val fitted = graft.ml.LdaPipeline.trainWithPartitions(spark, tokens,
        graft.ml.LdaPipeline.Params(k = 5, maxIterations = 50,
          algorithm = "em", seed = 42L), Some(p))
      val wall = (System.nanoTime() - t0) / 1e9
      val iters = graft.ml.LdaPipeline.emIterationTimes(fitted).getOrElse(Seq.empty)
      // r17 ADVICE #5: empty telemetry (accessor miss) must report the
      // partition point, not crash the sweep mid-run
      val medianIter =
        if (iters.nonEmpty) iters.sorted.apply(iters.size / 2) else Double.NaN
      println(f"[em-parts] dir=$sfDir parts=$p%2d wall=$wall%7.1f s " +
        f"iterSum=${iters.sum}%6.1f s medianIter=$medianIter%5.2f s")
      fitted.release()
    }
    spark.stop()
  }
}
