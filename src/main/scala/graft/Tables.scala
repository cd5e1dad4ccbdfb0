package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table registry over the driver-generated test data
  * (see TESTDATA.md / FIXTURES.md §B).
  *
  * At 100 TB these reads become partitioned parquet directory scans; the
  * single-file layout here is the sf-local stand-in. All downstream
  * operators keep filters/projections declarative so Catalyst pushes them
  * into the scan (`PushedFilters` / `ReadSchema`).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.parquet stores `ts` as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects. We read nanos as raw longs
    * (`spark.sql.legacy.parquet.nanosAsLong`, set session-wide by
    * Verify/Bench/tests) and rebuild a proper TimestampType column. The
    * fixture's nanos are microsecond-aligned, so `div 1000` is lossless. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val raw = s.read.parquet(s"$d/events.parquet")
    raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every table as a temp view so `spark.sql` queries
    * (GROUPING SETS etc.) can reference them by name. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
