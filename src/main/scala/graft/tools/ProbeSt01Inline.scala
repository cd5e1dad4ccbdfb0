package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sub-phase breakdown of one streaming query's wall (st01's body inlined
  * with timestamps): session clone, source construction, query start,
  * processAllAvailable, stop, and the final memory-table batch query.
  * Identifies which machinery phase owns the ~1 s non-job residue
  * ProbeStPhase measured (guide §1.1).
  */
object ProbeSt01Inline {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      spark.range(100000).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/region.parquet").count()
    } catch { case _: Throwable => () }

    (1 to 3).foreach { round =>
      val marks = Seq.newBuilder[(String, Double)]
      var t = System.nanoTime()
      def mark(n: String): Unit = {
        val now = System.nanoTime()
        marks += n -> (now - t) / 1e9
        t = now
      }
      val s = spark.newSession()
      s.conf.set("spark.sql.shuffle.partitions", "4")
      mark("newSession")
      val stream = graft.Tables.eventsStream(s, sfDir)
      mark("source_construct")
      val agg = stream
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          graft.functions.ExactAgg.dsum(col("value")).as("total_value"))
      val name = s"probe_sink_$round"
      mark("plan_construct")
      val q = agg.writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
      mark("start")
      q.processAllAvailable()
      mark("processAllAvailable")
      q.stop()
      mark("stop")
      val out = s.table(name)
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n"), col("total_value"))
        .orderBy("window_start", "event_type")
      mark("final_frame_construct")
      out.write.format("noop").mode("overwrite").save()
      mark("final_noop_write")
      println(s"[st01-inline] round $round " + marks.result()
        .map { case (n, v) => f"$n=$v%.3f" }.mkString(" "))
    }
    spark.stop()
  }
}
