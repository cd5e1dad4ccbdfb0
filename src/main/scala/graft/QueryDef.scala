package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One operator/query in the engine's declared surface.
  *
  * @param name   stable id (key in SparkEntry.queries / CORRECTNESS json)
  * @param fn     the Spark-native implementation
  * @param oracle equivalent ANSI SQL for DuckDB over the same parquet
  *               tables; None → driver records a weaker rows-only check
  *               (used for ops whose results are engine-defined: ML fits,
  *               approximate sketches, streaming state internals).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
