package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B for the streaming-family shuffle-partition floor: each stateful
  * streaming query instantiates numShufflePartitions state stores per
  * stateful operator per micro-batch — pure fixed cost at fixture scale
  * (the replay is a single file). Measures a sample of st queries under
  * the shared 32-partition conf vs a 4-partition scoped session
  * (results are partition-count independent: value-based oracles,
  * single-batch replay).
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.ProbeStream"
  */
object ProbeStream {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val base = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    base.sparkContext.setLogLevel("WARN")

    val qs = Seq("st01b_stream_hourly_wm", "st08_stream_stream_join",
      "st12_sliding_window", "st13_session_window", "st14_stream_neardup_admission",
      "st16_stream_cms_heavy_users")
    // warmup round (JVM/codegen), then one timed round per conf
    for ((parts, tag) <- Seq(("32", "warmup"), ("32", "32-part"), ("4", "4-part"))) {
      val ss = base.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", parts)
      var tot = 0.0
      qs.foreach { q =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(q)(ss, sfDir)
          .write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        tot += s
        if (tag != "warmup") println(f"[st-probe] $tag $q%-32s $s%6.2f s")
      }
      if (tag != "warmup") println(f"[st-probe] $tag TOTAL $tot%6.2f s")
    }
    base.stop()
  }
}
