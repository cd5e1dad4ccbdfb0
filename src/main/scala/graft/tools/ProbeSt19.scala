package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.Streams
import graft.{Tables => T}

/** st19 candidate-volume probe at the audit scales (r14 verdict #1:
  * the static SimHash index's fixed 8-bit bands paired ~N²/256; the
  * adaptive dial must show ~linear stream×index candidates in N).
  *
  * For each embeddings dir, reports — for the dialed layout AND a
  * forced fixed 8-bit layout — the band width r, the stream×index
  * band-collision count (the pre-verify candidate volume), and the
  * wall of the full streaming query.
  *
  * Run: sbt "runMain graft.tools.ProbeSt19 /root/testdata/sf0.1 /tmp/sf1 /tmp/sf3"
  */
object ProbeSt19 {
  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/sf1", "/tmp/sf3")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    dirs.foreach { d =>
      val eb = T.embeddings(spark, d)
      val n = eb.count()
      // adaptive = production dial (WIDE 4-band lane layout past 2^19
      // index vectors); fixed-15 = the old clamp; fixed-8 = r13's space
      Seq(None, Some(15), Some(8)).foreach { force =>
        val built = Streams.st19StaticIndex(spark, eb, force)
        val (idx, r) = (built.hinted, built.r)
        val cand = Streams
          .st19Banded(eb.filter(col("vec_id") % 5 === 0), r,
            "incoming_id", "ie", "inrm")
          .join(idx, Seq("k", "band"))
          .count()
        val label = force.map(b => s"fixed-$b").getOrElse("adaptive")
        val wall = if (force.isEmpty) {
          val t0 = System.nanoTime()
          Streams.st19.fn(spark, d)
            .write.format("noop").mode("overwrite").save()
          f"${(System.nanoTime() - t0) / 1e9}%7.2f s"
        } else "      - "
        println(f"[st19-probe] $d%-22s $label%-9s r=$r%2d n=$n%6d " +
          f"cand=$cand%12d wall=$wall")
      }
    }
    spark.stop()
  }
}
