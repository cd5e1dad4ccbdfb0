package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator in the engine's declared surface is a [[QueryDef]] in
  * one of the modules below; `queries` / `oracleSql` are derived from
  * them so names and column aliases stay in sync between the Spark
  * implementation and the DuckDB oracle.
  */
object SparkEntry {

  private def modules: Seq[QueryDef] =
    operators.Relational.defs ++
      operators.Windows.defs ++
      operators.Grouping.defs ++
      operators.Scalars.defs ++
      operators.TextAnalysis.defs ++
      operators.Curation.defs ++
      operators.Dedup.defs ++
      operators.Similarity.defs ++
      operators.MlQueries.defs ++
      operators.Advanced.defs ++
      operators.Extras.defs ++
      operators.Graph.defs ++
      operators.Storage.defs ++
      operators.Reshape.defs ++
      streaming.Streams.defs ++
      multimodal.Multimodal.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q05.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for engine-defined results
    * (ML fits, sketches) → driver records a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    modules.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
