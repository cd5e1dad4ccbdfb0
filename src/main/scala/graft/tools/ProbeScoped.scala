package graft.tools

import org.apache.spark.sql.SparkSession

/** Decomposes q64/q69's scoped-session cost (r18 verdict #6): both
  * queries clone the session per run (`newSession()` + conf overrides)
  * and re-host a tiny collected aggregate. Three questions, answered
  * driver-side: (1) what does a clone + conf-set cost, (2) does the
  * first table construction under the clone ride the schema memo
  * (keyed on applicationId|path|stamp — shared SparkContext means it
  * MUST hit) or re-infer, (3) how much of the query wall is clone +
  * construction vs the actual jobs. */
object ProbeScoped {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.openCostInBytes",
        sys.env.getOrElse("SPARK_GRAFT_OPEN_COST", "65536"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/region.parquet").count() // warm

    def ms(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
    }

    // (1) clone + conf cost, incl. first use of the clone's SessionState
    (1 to 5).foreach { i =>
      var ss: SparkSession = null
      val tClone = ms { ss = spark.newSession() }
      val tConf = ms {
        graft.operators.Extras.q64SkewConfs.foreach { case (k, v) => ss.conf.set(k, v) }
      }
      val tState = ms { ss.sessionState } // lazy init
      println(f"[scoped] rep $i clone=${tClone}%6.1f ms conf=${tConf}%6.1f ms stateInit=${tState}%6.1f ms")
    }

    // (2) table construction under a fresh clone: memo hit = few ms,
    // re-inference = 100-300 ms + a Spark job
    (1 to 3).foreach { i =>
      val ss = spark.newSession()
      val t = ms { graft.Tables.lineitem(ss, sfDir).schema }
      val t2 = ms { graft.Tables.part(ss, sfDir).schema }
      println(f"[scoped] rep $i clone-construct lineitem=${t}%6.1f ms part=${t2}%6.1f ms")
    }

    // (3) full-query wall for q64/q69, 3 reps each (first = cold JIT)
    Seq("q64_aqe_skew_join", "q69_bloom_runtime_filter").foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      (1 to 3).foreach { i =>
        val t = ms {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        }
        println(f"[scoped] $n rep $i wall=${t / 1000}%6.2f s")
      }
    }
    spark.stop()
  }
}
