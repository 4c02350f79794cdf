package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every declared operator's query + oracle from the package
  * objects (graft.query.Declared, graft.ops.*). Keys must be unique across
  * contributing maps; oracle column names match the Spark result columns.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    query.Declared.q4(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    query.Declared.queries ++ query.DeclaredExt.queries ++ query.DeclaredHep.queries ++
      query.DeclaredLlmSql.queries ++
      ops.DeclaredOps.queries ++ ops.DeclaredMedia.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    query.Declared.oracleSql ++ query.DeclaredExt.oracleSql ++ query.DeclaredHep.oracleSql ++
      query.DeclaredLlmSql.oracleSql ++
      ops.DeclaredOps.oracleSql ++ ops.DeclaredMedia.oracleSql
}
