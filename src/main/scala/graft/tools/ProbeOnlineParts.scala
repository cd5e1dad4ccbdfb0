package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** ONLINE-LDA corpus-partition sweep (r19; the ProbeEmParts counterpart
  * the r18 verdict asked for): ml06's wall is ~150 scheduler micro-jobs
  * (sampled-minibatch aggregation + update per iteration), so per-job
  * task count — the corpus partition count — is fixed cost multiplied
  * by ~3×maxIter. ProbeEmParts swept only the EM optimizer; this sweeps
  * the online one at the ml06 configuration and prints wall, job count,
  * summed job wall and the scheduler residue, so the coalesce rule for
  * the online path is a measured curve.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *   sbt "runMain graft.tools.ProbeOnlineParts 2 4 8"
  */
object ProbeOnlineParts {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val parts = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(2, 4, 8)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.openCostInBytes",
        sys.env.getOrElse("SPARK_GRAFT_OPEN_COST", "65536"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.setCheckpointDir(graft.TempDirs.deleteOnExit("graft_ckpt"))

    val tokens = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("tokens"))

    parts.foreach { p =>
      val t0 = System.nanoTime()
      val fitted = graft.ml.LdaPipeline.trainWithPartitions(spark, tokens,
        graft.ml.LdaPipeline.Params(k = 5, maxIterations = 50,
          algorithm = "online", seed = 42L), Some(p))
      val wall = (System.nanoTime() - t0) / 1e9
      val jobs = graft.ml.LdaPipeline.lastOnlineFitJobTimes.getOrElse(Seq.empty)
      val med = if (jobs.nonEmpty) jobs.sorted.apply(jobs.size / 2) else Double.NaN
      println(f"[online-parts] dir=$sfDir parts=$p%2d wall=$wall%7.2f s " +
        f"fitJobs=${jobs.size}%3d jobSum=${jobs.sum}%6.2f s medianJob=$med%6.3f s " +
        f"residue=${wall - jobs.sum}%6.2f s")
      fitted.release()
    }
    spark.stop()
  }
}
