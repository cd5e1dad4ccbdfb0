package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JIT + codegen + parquet reader init otherwise land
    // entirely on whichever query runs first (measured ~4 s on dd01)
    try {
      spark.range(100000).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/region.parquet").count()
    } catch { case _: Throwable => () }
    var failures = List.empty[String]
    // deterministic name order: shared builds (shingle index, jaccard
    // pairs, LDA/KMeans fits) are then attributed to the FIRST query of
    // their family (dd02, ml01, ss04) instead of whichever query a
    // hash-map iteration happens to visit first
    // optional comma-separated name-prefix filter for local iteration
    // (unset → full surface; the driver never sets it)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      only.forall(_.exists(n.startsWith))
    }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop write materializes every output row (projections, sorts,
      // UDFs) without side effects; a bare count() would let Catalyst
      // prune all projection work and time only the scan
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        failures ::= name
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val fails = failures.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","failures":$fails}"""
    // Stop Spark BEFORE printing so no executor/shutdown logging can
    // interleave with (or follow) the metric line; also persist a copy —
    // the round-1 driver failed to tail-parse stdout (sbt appends
    // "[success] ..." after our line).
    spark.stop()
    // never let a filtered iteration run overwrite the checked-in
    // full-surface artifact (BENCH_LOCAL.json is the claims record)
    if (only.isEmpty)
      try java.nio.file.Files.write(
        java.nio.file.Paths.get("BENCH_LOCAL.json"),
        line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch { case _: Throwable => () }
    println(s"BENCH_JSON: $line")
    println(line)
  }
}
