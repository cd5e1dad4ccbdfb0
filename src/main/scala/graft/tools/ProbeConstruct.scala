package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures the driver-side cost of constructing the table DataFrames
  * (parquet footer read + file listing per spark.read.parquet call) —
  * paid by EVERY query invocation, multiple times for multi-table
  * queries, before any job runs (guide §5: driver work shows up as
  * "nothing is running"). If a fresh construction costs tens of ms, a
  * 181-query × ~2.5-run bench pass pays seconds of pure metadata
  * re-reads for immutable fixture files. */
object ProbeConstruct {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/region.parquet").count() // warm FS + codepaths

    def timeMs(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
    }
    // per-table construction cost, 5 reps each
    graft.Tables.all.foreach { t =>
      val reps = (1 to 5).map(_ => timeMs {
        graft.Tables.load(spark, sfDir, t).schema
      })
      println(f"[construct] $t%-12s min=${reps.min}%6.1f ms  med=${reps.sorted.apply(2)}%6.1f ms")
    }
    // same constructions with the schema SUPPLIED (no inference job):
    graft.Tables.all.foreach { t =>
      val schema = spark.read.parquet(s"$sfDir/$t.parquet").schema
      val reps = (1 to 5).map(_ => timeMs {
        spark.read.schema(schema).parquet(s"$sfDir/$t.parquet").schema
      })
      println(f"[construct] with-schema $t%-12s min=${reps.min}%6.1f ms  med=${reps.sorted.apply(2)}%6.1f ms")
    }
    // a full surface's worth of constructions: every query's fn called
    // WITHOUT an action (what the driver pays before any job starts)
    val t0 = System.nanoTime()
    val perQ = Seq.newBuilder[(String, Double)]
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, fn) =>
      // streaming/fit queries run jobs during construction — skip them,
      // the point is the metadata cost of the pure-lazy majority
      if (!n.startsWith("st") && !n.startsWith("ml0") && !n.startsWith("ss04") &&
          !n.startsWith("dd") && !n.startsWith("ss") && !n.startsWith("mm") &&
          !n.startsWith("sp") && !n.startsWith("gr") && !n.startsWith("q39") &&
          !n.startsWith("q53") && !n.startsWith("q70")) {
        val t = timeMs { try fn(spark, sfDir).schema catch { case _: Throwable => () } }
        perQ += n -> t
      }
    }
    println(f"[construct] lazy q/ta/tf surface construction total: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    perQ.result().sortBy(-_._2).take(25).foreach { case (n, t) =>
      println(f"[construct]   $n%-42s ${t}%7.1f ms")
    }
    // scoped-session construction (r18 verdict #6): q64/q69 clone the
    // session per invocation (conf-scoped AQE-skew / bloom settings) —
    // confirm the clone (a) is cheap to create and (b) rides the
    // appId-keyed schema memo instead of re-inferring per clone
    val reps = (1 to 5).map { _ =>
      timeMs {
        val ss = spark.newSession()
        graft.operators.Extras.q64SkewConfs.foreach { case (k, v) => ss.conf.set(k, v) }
        graft.operators.Extras.skewJoined(ss, sfDir).schema
      }
    }
    println(f"[construct] scoped-session q64 chain (clone+confs+build): " +
      f"min=${reps.min}%6.1f ms med=${reps.sorted.apply(2)}%6.1f ms")
    spark.stop()
  }
}
