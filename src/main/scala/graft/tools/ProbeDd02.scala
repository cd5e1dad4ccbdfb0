package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Tables => T}

/** Stage-by-stage cold-cost decomposition of the dd02/dd05 shared
  * Jaccard pair-table build (r8: the r7 NOTES carried memo-warm sf1
  * numbers for dd02; the honest cold build is ~linear in corpus size
  * and this probe shows where the constant lives). Mirrors the exact
  * dataflow of Dedup.shingles + Dedup.jaccardPairs without the memo,
  * timing each materialization separately:
  *
  *   1. shingle index  — explode trigrams, 60-bit fingerprint, distinct,
  *                       df≤100 prune (the inverted-index build);
  *   2. prefix table   — global (df, h) rarest-first rank, keep
  *                       n − ⌈0.3·n⌉ + 1 per doc;
  *   3. candidates     — prefix⨝prefix equi-join on shingle, distinct;
  *   4. verification   — candidates ⨝ full sorted fingerprint arrays,
  *                       exact array_intersect Jaccard.
  *
  * Run: SPARK_GRAFT_SF_DIR=/tmp/sf1 sbt "runMain graft.tools.ProbeDd02"
  */
object ProbeDd02 {
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

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[dd02-probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val toks = T.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 3)
    val sh0 = toks
      .select(col("doc_id"), explode(
        expr("transform(sequence(0, size(t)-3), i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))")).as("s"))
      .select(col("doc_id"),
        conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("h"))
      .distinct()
    val dfr = sh0.groupBy("h").agg(count(lit(1)).as("df")).filter(col("df") <= 100)
    val sh = sh0.join(dfr, "h").select("doc_id", "h").cache()
    val nSh = time("1 shingle index (rows)")(sh.count())
    println(s"[dd02-probe] shingle rows = $nSh")

    val t = 0.3
    val dfTab = sh.groupBy("h").agg(count(lit(1)).as("hdf"))
    val wDoc = Window.partitionBy("doc_id").orderBy(col("hdf"), col("h"))
    val prefix = sh.join(dfTab, "h")
      .withColumn("rnk", row_number().over(wDoc))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("doc_id")))
      .filter(col("rnk") <= col("n") - ceil(col("n") * lit(t)) + 1)
      .select("doc_id", "h", "rnk", "n").cache()
    val nPre = time("2 prefix table (rows)")(prefix.count())
    println(s"[dd02-probe] prefix rows = $nPre")

    val candOld = prefix.as("a")
      .join(prefix.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
    val nCandOld = time("3a prefix-only candidates")(candOld.count())
    println(s"[dd02-probe] prefix-only candidate rows = $nCandOld")

    // the shipped r8 shape: PPJoin length + positional filters on top
    val posBound = lit(1.0) +
      least(col("a.n") - col("a.rnk"), col("b.n") - col("b.rnk"))
    val cand = prefix.as("a")
      .join(prefix.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id") &&
          least(col("a.n"), col("b.n")) >=
            lit(t) * greatest(col("a.n"), col("b.n")) - lit(1e-9) &&
          posBound >= lit(t / (1 + t)) * (col("a.n") + col("b.n")) - lit(1e-9))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct().cache()
    val nCand = time("3b +length+positional cand")(cand.count())
    println(s"[dd02-probe] ppjoin candidate rows = $nCand")
    prefix.unpersist()

    val sets = sh.groupBy("doc_id")
      .agg(sort_array(collect_list("h")).as("hs"), count(lit(1)).as("n"))
    val jac: DataFrame = cand
      .join(sets.select(col("doc_id").as("da"), col("hs").as("ha"), col("n").as("na")), "da")
      .join(sets.select(col("doc_id").as("db"), col("hs").as("hb"), col("n").as("nb")), "db")
      .withColumn("c", size(array_intersect(col("ha"), col("hb"))).cast("long"))
      .withColumn("jaccard", col("c") * lit(1.0) / (col("na") + col("nb") - col("c")))
      .select("da", "db", "c", "na", "nb", "jaccard")
    time("4a verify (shuffle joins)")(
      jac.write.format("noop").mode("overwrite").save())

    val setsB = broadcast(sets)
    val jacB: DataFrame = cand
      .join(setsB.select(col("doc_id").as("da"), col("hs").as("ha"), col("n").as("na")), "da")
      .join(setsB.select(col("doc_id").as("db"), col("hs").as("hb"), col("n").as("nb")), "db")
      .withColumn("c", size(array_intersect(col("ha"), col("hb"))).cast("long"))
      .withColumn("jaccard", col("c") * lit(1.0) / (col("na") + col("nb") - col("c")))
      .select("da", "db", "c", "na", "nb", "jaccard")
    time("4b verify (broadcast sets)")(
      jacB.write.format("noop").mode("overwrite").save())

    println(s"[dd02-probe] rows: shingles=$nSh prefix=$nPre candOld=$nCandOld cand=$nCand")
    spark.stop()
  }
}
