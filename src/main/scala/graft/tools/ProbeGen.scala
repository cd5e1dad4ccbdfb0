package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{Tables => T}

/** Generate re-evaluation sweep (round-9 finding, st14): when an
  * EXPENSIVE expression is the generator child — explode(f(x)) — the
  * Generate path may re-evaluate f per EMITTED row (measured 8× on
  * posexplode(minhash_sigs)). This probe A/Bs the remaining
  * expensive-child explode sites against the index-explode-subscript
  * form that keeps f a projected column outside the Generate:
  *
  *   1. dd11's explode(shingle_stats(text, 8))   (~50 rows/doc)
  *   2. the IVF probe explode(slice(array_sort(transform(...vec_l2sq...))))
  *      over a corpus side (~nprobe rows/vector)
  *
  * Run: SPARK_GRAFT_SF_DIR=/tmp/sf1 sbt "runMain graft.tools.ProbeGen"
  */
object ProbeGen {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.ShingleStats.register(spark)
    graft.functions.FloatL2.register(spark)

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[gen-probe] $name%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = T.documents(spark, sfDir).repartition(32).cache()
    docs.count()
    time("shingle_stats: explode(kernel) direct")(
      docs.select(col("doc_id"), explode(expr("shingle_stats(text, 8)")).as("g"))
        .agg(count(lit(1))).head())
    time("shingle_stats: index-explode + subscript")(
      docs.select(col("doc_id"), expr("shingle_stats(text, 8)").as("gs"))
        .selectExpr("doc_id", "gs", "explode(sequence(0, size(gs) - 1)) AS i")
        .selectExpr("doc_id", "gs[CAST(i AS INT)] AS g")
        .agg(count(lit(1))).head())

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .repartition(32).cache()
    emb.count()
    val rnd = new scala.util.Random(7)
    val cents = (0 until 64).map(_ =>
      array((0 until 64).map(_ => lit(rnd.nextGaussian())): _*))
    val centLit = array(cents: _*)
    val probeExpr =
      "slice(array_sort(transform(cents, (c, i) -> struct(vec_l2sq(embedding, c) AS d, i AS cell))), 1, 4)"
    time("ivf probes: explode(slice(sort(transform)))")(
      emb.withColumn("cents", centLit)
        .select(col("vec_id"), explode(expr(probeExpr)).as("pc"))
        .agg(count(lit(1)), min("pc.cell")).head())
    time("ivf probes: index-explode + subscript")(
      emb.withColumn("cents", centLit)
        .select(col("vec_id"), expr(probeExpr).as("ps"))
        .selectExpr("vec_id", "ps", "explode(sequence(0, size(ps) - 1)) AS i")
        .selectExpr("vec_id", "ps[CAST(i AS INT)] AS pc")
        .agg(count(lit(1)), min("pc.cell")).head())
    spark.stop()
  }
}
