package graft.tools

import org.apache.spark.sql.SparkSession

/** Formatted-plan dumper for the FACTORED internal frames whose physical
  * shape the specs lock but whose query-level explain hides (the
  * GlobalCumsum localCheckpoints truncate sp09/sp11/sp12's visible plan
  * to the packing tail). Mirrors graft.Explain's session confs so the
  * audited plans are the shipped plans.
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt 'runMain graft.tools.ExplainFrames /root/testdata/sf0.1 sp11 sp12'
  */
object ExplainFrames {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq else Seq("sp11", "sp12")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.openCostInBytes",
        sys.env.getOrElse("SPARK_GRAFT_OPEN_COST", "65536"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val frames: Map[String, () => org.apache.spark.sql.DataFrame] = Map(
      "sp11" -> (() => graft.operators.Curation.admittedCuration(spark, sfDir)),
      "sp12" -> (() => graft.multimodal.Multimodal.multimodalAdmitted(spark, sfDir)))
    names.foreach { n =>
      println(s"\n========== $n (admission-chain frame) ==========")
      frames(n)().explain("formatted")
    }
    spark.stop()
  }
}
