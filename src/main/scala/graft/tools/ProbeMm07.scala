package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.{Tables => T}

/** mm07 candidate-volume probe for the at-scale legs (r14 verdict #1
  * done-bar: "a 30× leg showing candidate counts ~linear in N").
  *
  * For each documents dir passed as an arg (default: the gen_mm_hotband
  * fixtures at /tmp/mmhot{1x,10x,30x}), reports — for the dialed
  * adaptive layout AND a forced fixed 8-bit layout — the band width r,
  * the stop-band prune's pre/post candidate-pair counts of both
  * evidence joins, and the wall time of the full admission dataflow.
  * The adaptive post-prune count is the number that must stay ~linear
  * in N.
  *
  * Run: sbt "runMain graft.tools.ProbeMm07 /tmp/mmhot1x /tmp/mmhot10x /tmp/mmhot30x"
  */
object ProbeMm07 {
  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/tmp/mmhot1x", "/tmp/mmhot10x", "/tmp/mmhot30x")
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
      val docs = T.documents(spark, d)
      // adaptive = the production dial (WIDE 4x30-bit-lane layout past
      // 2^19 docs); fixed-15 = the old clamp (the best the narrow
      // 60-bit fingerprint can do); fixed-8 = the r13-era fixed space
      Seq(None, Some(15), Some(8)).foreach { force =>
        val parts = Multimodal.perceptualParts(spark, docs, force)
        try {
          // candidate pairs of BOTH evidence joins (corpus probe +
          // lower-id batch probe), before the per-pair distinct —
          // the volume the stop-band prune and the band width govern
          def pairs(probe: org.apache.spark.sql.DataFrame): Long = {
            val cvc = probe.as("x").join(parts.bcorp.as("y"),
              col("x.k") === col("y.k") && col("x.band") === col("y.band"))
            val dvd = probe.as("x").join(probe.as("y"),
              col("x.k") === col("y.k") && col("x.band") === col("y.band") &&
                col("y.doc_id") < col("x.doc_id"))
            cvc.count() + dvd.count()
          }
          val pre = pairs(parts.binc)
          val post = pairs(parts.bincP)
          val t0 = System.nanoTime()
          Multimodal.perceptualAdmission(spark, docs, force)
            .write.format("noop").mode("overwrite").save()
          val wall = (System.nanoTime() - t0) / 1e9
          val label = force.map(b => s"fixed-$b").getOrElse("adaptive")
          println(f"[mm07-probe] $d%-16s $label%-9s r=${parts.r}%2d " +
            f"n=${parts.nAll}%7d cand_pre=$pre%12d cand_post=$post%12d " +
            f"wall=$wall%7.2f s")
        } finally parts.hash.unpersist()
      }
    }
    spark.stop()
  }
}
