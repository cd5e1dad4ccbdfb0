package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{Tables => T}

/** Stage decomposition of st14's cost at a given fixture: corpus index
  * build, stream-side signature extraction (batch-equivalent), the
  * band join + groupBy, and the true streaming run end-to-end — so the
  * dominant stage is measured, not guessed.
  *
  * Run: SPARK_GRAFT_SF_DIR=/tmp/sf1 sbt "runMain graft.tools.ProbeSt14"
  */
object ProbeSt14 {
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
    graft.functions.MinHashSigs.register(spark)

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[st14-probe] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    def sigs(df: org.apache.spark.sql.DataFrame) = df
      .filter(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"), expr("minhash_sigs(text, 8)").as("ms"))
      .selectExpr("doc_id", "posexplode(ms) AS (i, m)")

    val corp = sigs(T.widened(T.documents(spark, sfDir).filter(col("doc_id") % 5 =!= 0)))
      .withColumnRenamed("doc_id", "corpus_id").cache()
    time("corpus index (widened batch)")(corp.count())
    println(s"[st14-probe] corp partitions = ${corp.rdd.getNumPartitions}")
    // raw kernel throughput, forced parallel, no cache in the way
    val raw = T.documents(spark, sfDir).filter(col("doc_id") % 5 =!= 0)
      .repartition(32)
      .selectExpr("doc_id", "size(minhash_sigs(text, 8)) AS n")
    time("kernel only, repartition(32)")(raw.agg(sum("n")).head())
    val rawExpl = T.documents(spark, sfDir).filter(col("doc_id") % 5 =!= 0)
      .repartition(32)
      .select(col("doc_id"), expr("minhash_sigs(text, 8)").as("ms"))
      .selectExpr("doc_id", "posexplode(ms) AS (i, m)")
    time("kernel + posexplode, no cache")(rawExpl.count())
    val rawExpl2 = T.documents(spark, sfDir).filter(col("doc_id") % 5 =!= 0)
      .repartition(32)
      .select(col("doc_id"), expr("minhash_sigs(text, 8)").as("ms"))
      .localCheckpoint(true)
      .selectExpr("doc_id", "posexplode(ms) AS (i, m)")
    time("kernel checkpointed, then explode")(rawExpl2.count())
    // explode a constant index array and subscript — the kernel stays a
    // plain projected column outside the Generate
    val rawExpl3 = T.documents(spark, sfDir).filter(col("doc_id") % 5 =!= 0)
      .repartition(32)
      .select(col("doc_id"), expr("minhash_sigs(text, 8)").as("ms"))
      .selectExpr("doc_id", "ms", "explode(sequence(0, 7)) AS i")
      .selectExpr("doc_id", "i", "ms[CAST(i AS INT)] AS m")
    time("kernel + index-explode subscript")(rawExpl3.agg(count(lit(1)), min("m")).head())
    val inc1 = sigs(T.documents(spark, sfDir).filter(col("doc_id") % 5 === 0))
      .withColumnRenamed("doc_id", "incoming_id").cache()
    time("incoming sigs (1-task batch)")(inc1.count())
    time("band join + groupBy")(
      inc1.join(corp, Seq("i", "m"))
        .groupBy("incoming_id", "corpus_id")
        .agg(count(lit(1)).as("shared_bands")).count())
    time("full st14 (streaming, end-to-end)")(
      graft.SparkEntry.queries("st14_stream_neardup_admission")(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
