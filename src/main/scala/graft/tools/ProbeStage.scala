package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Generic stage-level profiler (guide §1.1: find where the time goes
  * before touching anything) for any declared query: runs it under the
  * Bench session confs and prints, per run, the wall, the job count,
  * the summed job wall vs the union of job intervals (residue = driver
  * machinery between jobs), and the top stages by SUMMED TASK TIME with
  * their task counts and max/median task skew — the per-operator
  * evidence the UI's stage page would show, captured headlessly.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *   sbt 'runMain graft.tools.ProbeStage sp12_multimodal_curation_pipeline'
  */
object ProbeStage {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "3").toInt
    val names = if (args.nonEmpty) args.toSeq else Seq("sp12_multimodal_curation_pipeline")
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
    // ad-hoc A/B confs: SPARK_GRAFT_PROBE_CONF="key=value;key=value"
    sys.env.get("SPARK_GRAFT_PROBE_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
    })
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.setCheckpointDir(graft.TempDirs.deleteOnExit("graft_ckpt"))
    try {
      spark.range(100000).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/region.parquet").count()
    } catch { case _: Throwable => () }

    // per-stage record: (name, taskTimes ms); jobs as (start, end)
    val stageTasks = scala.collection.concurrent.TrieMap
      .empty[Int, (String, scala.collection.mutable.ArrayBuffer[Double])]
    val jobStarts = scala.collection.concurrent.TrieMap.empty[Int, Long]
    val jobs = scala.collection.concurrent.TrieMap.empty[Int, (Long, Long)]
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobStarts(j.jobId) = j.time
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobStarts.remove(j.jobId).foreach(t0 => jobs(j.jobId) = (t0, j.time))
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit = {
        // the SQL-operator scopes of the stage's RDDs name WHAT runs in
        // it (Exchange/HashAggregate/WholeStageCodegen...) far better
        // than the thread-pool callsite
        val scopes = s.stageInfo.rddInfos.flatMap(_.scope)
          .map(_.name.takeWhile(_ != '\n')).distinct.take(5).mkString("|")
        stageTasks.getOrElseUpdate(s.stageInfo.stageId,
          ((if (scopes.nonEmpty) scopes else s.stageInfo.name.takeWhile(_ != '\n')),
            scala.collection.mutable.ArrayBuffer.empty[Double]))
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        stageTasks.get(t.stageId).foreach(_._2 +=
          (if (t.taskInfo != null) t.taskInfo.duration.toDouble else 0.0))
    }
    spark.sparkContext.addSparkListener(listener)

    names.foreach { n =>
      (1 to reps).foreach { round =>
        stageTasks.clear(); jobs.clear()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(400) // listener bus drain
        val js = jobs.values.toSeq.sortBy(_._1)
        val jobSum = js.map { case (s, e) => (e - s) / 1e3 }.sum
        var covered = 0L; var curS = Long.MinValue; var curE = Long.MinValue
        js.foreach { case (s, e) =>
          if (s > curE) { covered += (curE - curS).max(0L); curS = s; curE = e }
          else if (e > curE) curE = e
        }
        covered += (curE - curS).max(0L)
        val stages = stageTasks.toSeq.map { case (id, (nm, ts)) =>
          (id, nm, ts.sum / 1e3, ts.size,
            if (ts.nonEmpty) ts.max / 1e3 else 0.0,
            if (ts.nonEmpty) ts.sorted.apply(ts.size / 2) / 1e3 else 0.0)
        }
        val taskSum = stages.map(_._3).sum
        println(f"[stage-probe] $n round $round wall=$wall%6.2f s jobs=${js.size}%3d " +
          f"jobUnion=${covered / 1e3}%6.2f s residue=${wall - covered / 1e3}%6.2f s " +
          f"stages=${stages.size}%3d taskSum=$taskSum%7.2f s")
        stages.sortBy(-_._3).take(12).foreach { case (id, nm, sum, cnt, mx, med) =>
          println(f"[stage-probe]    stage $id%4d $nm%-40s taskSum=$sum%7.2f s n=$cnt%4d max=$mx%6.2f med=$med%6.3f")
        }
      }
    }
    spark.stop()
  }
}
