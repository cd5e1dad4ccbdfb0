package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.{Tables => T}

/** dd07 vs dd07b candidate-volume A/B (r8 verdict item #1): measures
  * the banded-join candidate count and end-to-end verified-pair cost
  * for the FIXED layout (2 bands × 8 bits — dd07's oracle-pinned shape,
  * candidates ∝ N²/2⁸) against the ADAPTIVE layout (4 bands ×
  * r = clamp(⌈log2 N⌉−4, 8, 15) bits — dd07b), on any fixture dir.
  * The claim under test: adaptive candidate volume stays ~O(N·bands·16)
  * as N grows, i.e. the candidates-per-vector curve FLATTENS where the
  * fixed layout's grows linearly in N.
  *
  * Run: SPARK_GRAFT_SF_DIR=/tmp/sf3 sbt "runMain graft.tools.ProbeDd07"
  */
object ProbeDd07 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf3")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Similarity.regDot(spark)

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[dd07-probe] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val e0 = T.embeddings(spark, sfDir)
    val n = e0.count()
    println(s"[dd07-probe] dir=$sfDir n=$n")

    def layout(tag: String, bands: Int, r: Int): Unit = {
      // the PRODUCTION construction (r15 ADVICE #3): signature kernel,
      // narrow windows vs wide 30-bit lanes, and the candidate join all
      // come from Similarity's factored pieces, so on a dial-crossing
      // fixture this curve measures exactly what dd07/dd07b run
      val (b, banded) = Similarity.simhashSigBanded(spark, e0, bands, r)
      val cand = Similarity.simhashCandidates(banded).cache()
      val nCand = time(s"$tag candidates (bands=$bands r=$r)")(cand.count())
      val dim = b.select(size(col("embedding"))).first().getInt(0).toLong
      val bSmall = n * (48L + 4L * dim) < (128L << 20)
      def side(idAs: String, eAs: String, nAs: String) = {
        val s0 = b.select(col("vec_id").as(idAs), col("embedding").as(eAs),
          col("nrm").as(nAs))
        if (bSmall) broadcast(s0) else s0
      }
      val nPairs = time(s"$tag verify+filter")(
        cand.join(side("va", "ea", "na"), "va")
          .join(side("vb", "eb", "nb"), "vb")
          .withColumn("cos_sim",
            expr(Similarity.dotExpr.format("ea", "eb")) / (col("na") * col("nb")))
          .filter(col("cos_sim") >= 0.35)
          .count())
      println(f"[dd07-probe] $tag%-10s cand=$nCand%,d (${nCand.toDouble / n}%.1f/vec)  pairs>=0.35=$nPairs%,d")
      cand.unpersist(); b.unpersist()
    }

    layout("fixed", bands = 2, r = 8)
    layout("adaptive", bands = 4, r = Similarity.simhashBitsWide(n))
    spark.stop()
  }
}
