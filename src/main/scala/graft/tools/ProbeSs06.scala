package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage timing for ss06 at the given SF: quantize-only vs full query —
  * decides whether a native quantize expression is worth building. */
object ProbeSs06 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf3")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.FloatDot.register(spark)

    def time[A](name: String)(f: => A): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[ss06-probe] $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }

    val e0 = spark.read.parquet(s"$sfDir/embeddings.parquet")
    e0.count()
    val q = e0
      .withColumn("mx", greatest(
        expr("array_max(transform(embedding, y -> abs(CAST(y AS DOUBLE))))"),
        lit(1e-30)))
      .select(col("vec_id"), expr(
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 127.0D / mx) AS BIGINT))")
        .as("qv"))
    time("quantize only")(
      q.write.format("noop").mode("overwrite").save())
    val qd = q.withColumn("qvd", expr("transform(qv, x -> CAST(x AS DOUBLE))"))
      .withColumn("self", expr("vec_dot(qvd, qvd)"))
    time("quantize+cast+selfdot")(
      qd.write.format("noop").mode("overwrite").save())
    time("full ss06")(
      graft.operators.Similarity.ss06.fn(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
