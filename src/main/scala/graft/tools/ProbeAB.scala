package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B/C micro-bench for the IVF centroid-assignment probe (r7 verdict
  * item #3 / #6): measures, on the full embeddings table of
  * SPARK_GRAFT_SF_DIR (default /tmp/sf1, 20k × 64-d),
  *
  *   A. the pre-r8 shape — posexplode(all k centroids) + CodegenFallback
  *      aggregate(zip_with(...)) squared distance + row_number window
  *      (one shuffle of N·k rows);
  *   B. the same explode+window shape with the native vec_l2sq distance
  *      (isolates the HOF→native delta);
  *   C. the r8 production shape — per-row
  *      slice(array_sort(transform(cents, ... vec_l2sq ...)), 1, nprobe)
  *      (no explode, no window exchange — isolates the shuffle delta).
  *
  * All three produce the identical (id, cell) probe set (asserted), so
  * the timings are an apples-to-apples cost comparison of the plan
  * shapes the engine could ship. Results feed NOTES.md.
  */
object ProbeAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val nprobe = 4
    val k = 64 // a "k grows with the corpus" cell count, not the sf0.1 k=8
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.FloatL2.register(spark)

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).cache()
    val n = emb.count()
    // deterministic pseudo-centroids: the first k embeddings, as doubles
    // (litteral codebook — the same broadcast-literal trick the engine
    // uses; k-means quality is irrelevant to probe COST)
    val cents = emb.filter(col("vec_id") < k).orderBy("vec_id")
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(cents.length == k)
    val centLit = array(cents.map(c => array(c.map(lit): _*)): _*)

    val hofDist =
      "aggregate(zip_with(embedding, cent, (x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    val w = Window.partitionBy("vec_id").orderBy(col("dist"), col("cell"))

    def shapeA: DataFrame = emb
      .select(col("vec_id"), col("embedding"), posexplode(centLit).as(Seq("cell", "cent")))
      .withColumn("dist", expr(hofDist))
      .withColumn("pr", row_number().over(w))
      .filter(col("pr") <= nprobe)
      .select("vec_id", "cell")

    def shapeB: DataFrame = emb
      .select(col("vec_id"), col("embedding"), posexplode(centLit).as(Seq("cell", "cent")))
      .withColumn("dist", expr("vec_l2sq(embedding, cent)"))
      .withColumn("pr", row_number().over(w))
      .filter(col("pr") <= nprobe)
      .select("vec_id", "cell")

    def shapeC: DataFrame = emb
      .withColumn("cents", centLit)
      .select(col("vec_id"), explode(expr(
        s"slice(array_sort(transform(cents, (c, i) -> struct(vec_l2sq(embedding, c) AS d, i AS cell))), 1, $nprobe)")).as("pc"))
      .select(col("vec_id"), col("pc.cell").as("cell"))

    def time(name: String, df: => DataFrame): Double = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val best = runs.min
      println(f"$name%-12s best ${best}%.3f s  (runs: ${runs.map(t => f"$t%.3f").mkString(", ")})")
      best
    }

    emb.write.format("noop").mode("overwrite").save() // warm cache
    val a = time("A hof+window", shapeA)
    val b = time("B nat+window", shapeB)
    val c = time("C nat+map", shapeC)

    // identical probe sets — the semantic guarantee the swap rests on
    val diff = shapeA.exceptAll(shapeC).count() + shapeC.exceptAll(shapeA).count()
    val diffB = shapeB.exceptAll(shapeC).count()
    println(s"probe-set diff A vs C: $diff, B vs C: $diffB (must be 0)")
    println(f"PROBE_AB: {\"n\":$n,\"k\":$k,\"nprobe\":$nprobe,\"hof_window\":$a%.3f,\"nat_window\":$b%.3f,\"nat_map\":$c%.3f}")
    spark.stop()
  }
}
