package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{LinkageQueries, PipelineQueries, RelationalQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is assembled from per-module query catalogs; every entry with a
  * DuckDB-expressible equivalent also appears in `oracleSql` (same column
  * names on both sides — the driver sorts columns by name before hashing).
  */
object SparkEntry {

  private def allDefs =
    RelationalQueries.defs ++ LinkageQueries.defs ++ PipelineQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allDefs.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
