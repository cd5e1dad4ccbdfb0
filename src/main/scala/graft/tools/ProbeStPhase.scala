package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Phase profiler for the streaming family (guide §1.1: decide where the
  * time goes before touching anything). StreamingQueryListener can't see
  * the scoped sessions' queries (each newSession owns its own
  * StreamingQueryManager), so this uses the CORE scheduler listener —
  * jobs are global to the SparkContext. For each query invocation it
  * prints the wall, the number of Spark jobs, the summed job wall, and
  * the residue (driver-side machinery: micro-batch planning, offset/
  * commit WAL writes, state-store init, query start/stop latches).
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *   sbt 'runMain graft.tools.ProbeStPhase st01_stream_hourly ...'
  */
object ProbeStPhase {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("st01_stream_hourly", "st06_watermark_append",
        "st08_stream_stream_join", "st13_session_window",
        "st17_stream_session_join", "st21_stream_framedup_admission")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.setCheckpointDir(graft.TempDirs.deleteOnExit("graft_ckpt"))
    try {
      spark.range(100000).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/region.parquet").count()
    } catch { case _: Throwable => () }

    val starts = scala.collection.concurrent.TrieMap.empty[Int, Long]
    val jobs = scala.collection.concurrent.TrieMap.empty[Int, (Long, Long)] // id -> (start, end)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = starts(j.jobId) = j.time
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach(t0 => jobs(j.jobId) = (t0, j.time))
    }
    spark.sparkContext.addSparkListener(listener)

    names.foreach { n =>
      (1 to 3).foreach { round =>
        jobs.clear()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // let the async listener bus drain
        val js = jobs.values.toSeq.sortBy(_._1)
        val jobSum = js.map { case (s, e) => (e - s) / 1e3 }.sum
        // jobs can overlap; also compute the union of job intervals
        var covered = 0L
        var curS = Long.MinValue; var curE = Long.MinValue
        js.foreach { case (s, e) =>
          if (s > curE) { covered += curE - curS max 0L; curS = s; curE = e }
          else if (e > curE) curE = e
        }
        covered += (curE - curS).max(0L)
        println(f"[st-phase] $n round $round wall=$wall%6.2f s  jobs=${js.size}%3d  jobSum=$jobSum%6.2f s  jobUnion=${covered / 1e3}%6.2f s  residue=${wall - covered / 1e3}%6.2f s")
      }
    }
    spark.stop()
  }
}
