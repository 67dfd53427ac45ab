package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps each SURVEY.md §2 qid to a Spark implementation over
  * the driver's parquet test tables; `oracleSql` holds the equivalent
  * DuckDB SQL for the hash-compare gate. Column names are aliased
  * identically on both sides (driver sorts columns by name before
  * hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.RelationalQueries.q1Pricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.RelationalQueries.queries ++
      operators.ScalarFnQueries.queries ++
      operators.JoinQueries.queries ++
      operators.WindowQueries.queries ++
      operators.TextQueries.queries ++
      operators.SampleQueries.queries ++
      operators.DedupQueries.queries ++
      operators.SimilarityQueries.queries ++
      operators.PqIndex.queries ++
      operators.MultimodalQueries.queries ++
      operators.PipelineQueries.queries ++
      operators.EventQueries.queries ++
      operators.TimeSeriesQueries.queries ++
      operators.WarcQueries.queries ++
      operators.TextExtractQueries.queries ++
      operators.LinearClassifyQueries.queries ++
      operators.SourceSinkQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.RelationalQueries.oracle ++
      operators.ScalarFnQueries.oracle ++
      operators.JoinQueries.oracle ++
      operators.WindowQueries.oracle ++
      operators.TextQueries.oracle ++
      operators.SampleQueries.oracle ++
      operators.DedupQueries.oracle ++
      operators.SimilarityQueries.oracle ++
      operators.PqIndex.oracle ++
      operators.MultimodalQueries.oracle ++
      operators.PipelineQueries.oracle ++
      operators.EventQueries.oracle ++
      operators.TimeSeriesQueries.oracle ++
      operators.WarcQueries.oracle ++
      operators.TextExtractQueries.oracle ++
      operators.LinearClassifyQueries.oracle ++
      operators.SourceSinkQueries.oracle
}
