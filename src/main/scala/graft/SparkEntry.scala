package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Registry, Relational}
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Each `queries` entry demonstrates one operator from SURVEY.md §2 (plus the
  * LLM-pipeline extensions); `oracleSql` holds the DuckDB-equivalent SQL the
  * driver hash-compares against on sf0.01. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(Tables(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Registry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Registry.oracleSql
}
