package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.{Tables => T}

/** st20 cost decomposition (the ProbeSs15 pattern): epoch fits vs the
  * static index build vs the streaming admission query itself, so a
  * slow st20 sample attributes to the right stage.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *        sbt "runMain graft.tools.ProbeSt20"
  */
object ProbeSt20 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
      println(f"[st20-probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val emb = T.embeddings(spark, sfDir)
    val corpus = emb.filter(col("vec_id") % 5 =!= 0)
    val (km, pq) = time("epoch fits (km + 4 pq)") {
      Similarity.fitEpochModels(corpus)
    }
    val index = time("static index build + cache") {
      val i = Similarity.ivfpqIndexFrame(km, pq, T.widened(corpus)).cache()
      i.count()
      i
    }
    time("batch-twin admission") {
      Similarity.ivfCellAdmission(emb.filter(col("vec_id") % 5 === 0), index, km)
        .write.format("noop").mode("overwrite").save()
    }
    time("full streaming query (st20)") {
      graft.streaming.Streams.st20.fn(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    time("full streaming query (warm)") {
      graft.streaming.Streams.st20.fn(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    index.unpersist()
    spark.stop()
  }
}
