package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.{Tables => T}

/** ss15 cost decomposition: epoch model fits (offline at 100 TB, paid
  * per bench run here) vs the incremental-maintenance dataflow itself
  * (the per-day cost the operator models). Separating the two tells
  * whether a slow ss15 sample is fit overhead or the admission job.
  *
  * Run: SPARK_GRAFT_SF_DIR=/tmp/sf3 sbt "runMain graft.tools.ProbeSs15"
  */
object ProbeSs15 {
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
      println(f"[ss15-probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val emb = T.embeddings(spark, sfDir)
    val corpus = emb.filter(col("vec_id") % 5 =!= 0)
    println(s"[ss15-probe] corpus partitions: ${corpus.rdd.getNumPartitions}, " +
      s"rows: ${corpus.count()}")
    val (km, pq) = time("epoch fits (km + 4 pq)") {
      Similarity.fitEpochModels(corpus)
    }
    println(s"[ss15-probe] coarse k = ${km.clusterCenters.length}")
    val (dec, _) = time("maintenance dataflow") {
      Similarity.incrementalIvfpqIndex(spark, emb, km, pq)
    }
    time("decisions re-read (memo)") {
      dec.write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
