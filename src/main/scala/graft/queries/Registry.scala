package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.Tables

/** One verifiable operator demonstration: a Spark query over the driver's
  * parquet tables plus (when SQL-expressible) an equivalent DuckDB oracle.
  * Column names must match between the two (the driver sorts columns by name
  * before hashing). */
final case class Q(name: String,
                   run: Tables => DataFrame,
                   oracle: Option[String]) {
  def fn: (SparkSession, String) => DataFrame =
    (spark, dir) => run(Tables(spark, dir))
}

object Registry {
  def all: Seq[Q] = Relational.entries ++ Tsdb.entries ++ Pipeline.entries ++ Histograms.entries

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
