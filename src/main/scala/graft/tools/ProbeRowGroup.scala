package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Single-row-group scan-parallelism probe (guide §2.5 input skew /
  * §1.1 measure first). The sf fixtures are ONE parquet row group per
  * file (duckdb parquet_metadata), and a row group is indivisible: no
  * matter how many byte splits the scan is cut into, every row lands in
  * the one task whose split contains the row-group offset — so ALL
  * map-side work fused into the scan stage (decode, filters, md5
  * chains, partial aggregation) runs on ONE core of the 32.
  *
  * This probe measures, min-of-3 with interleaved order:
  *   scan    — decode-only floor (select the q01 columns, noop)
  *   q01A    — q01's 8-way decimal agg as shipped (fused partial agg)
  *   q01B    — same + repartition(cores) after the read: decode stays
  *             single-task, the decimal partial agg parallelizes
  *   md5A    — dd12's shape: explode 5-shingles, 16 min(md5) aggs, fused
  *   md5B    — same + repartition(cores) before the explode
  * and prints the realized scan-stage task count that did >0 rows.
  */
object ProbeRowGroup {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.openCostInBytes", "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      spark.range(100000).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/region.parquet").count()
    } catch { case _: Throwable => () }

    import graft.functions.ExactAgg._
    def li = graft.Tables.lineitem(spark, sfDir)
    def docs = graft.Tables.documents(spark, sfDir)

    // how many scan tasks actually carried rows?
    val perPart = li.select(spark_partition_id().as("p")).groupBy("p").count()
    val nonEmpty = perPart.count()
    println(s"[rg] lineitem scan partitions with rows: $nonEmpty")

    def q01Agg(df: DataFrame): DataFrame = df
      .filter(col("l_shipdate") <= to_timestamp(lit("2000-09-02")))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsumWide(col("l_extendedprice") * (lit(1.0) - col("l_discount")), D6).as("sum_disc_price"),
        dsumWide(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")), D6).as("sum_charge"),
        (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
        (dsum(col("l_discount")) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))

    def md5Sig(df: DataFrame): DataFrame = {
      val sh = df.select(col("doc_id"),
          explode(expr("transform(sequence(1, greatest(length(text) - 4, 1)), i -> substring(text, i, 5))")).as("g"))
        .select(col("doc_id"), xxhash64(col("g")).as("h"))
      val aggs = (0 until 16).map(i =>
        min(md5(concat(lit(s"$i:"), col("h").cast("string")))).as(s"m$i"))
      sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
    }

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "scan" -> (() => li.select("l_returnflag", "l_linestatus", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_shipdate")),
      "q01A" -> (() => q01Agg(li)),
      "q01B" -> (() => q01Agg(li.repartition(cpus))),
      "md5A" -> (() => md5Sig(docs)),
      "md5B" -> (() => md5Sig(docs.repartition(cpus))))

    val times = scala.collection.mutable.Map.empty[String, List[Double]]
    (1 to 3).foreach { round =>
      variants.foreach { case (n, f) =>
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        times(n) = s :: times.getOrElse(n, Nil)
        println(f"[rg] round $round $n%-5s $s%6.3f s")
      }
    }
    times.toSeq.sortBy(_._1).foreach { case (n, ts) =>
      println(f"[rg] MIN $n%-5s ${ts.min}%6.3f s   (all: ${ts.reverse.map(t => f"$t%.3f").mkString(", ")})")
    }
    spark.stop()
  }
}
