package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog over the driver-provided parquet directory (TESTDATA.md).
  *
  * Mirrors the reference's block discovery in spirit (locate/discover.go:125):
  * the "catalog" is a directory of parquet files keyed by table name; Spark's
  * native parquet reader (vectorized, predicate/projection pushdown) replaces
  * the reference's hand-rolled page IO (search/constraint.go, locate/bucket.go).
  */
final case class Tables(spark: SparkSession, dir: String) {
  def table(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = table("region")
  def nation: DataFrame     = table("nation")
  def customer: DataFrame   = table("customer")
  def supplier: DataFrame   = table("supplier")
  def part: DataFrame       = table("part")
  def orders: DataFrame     = table("orders")
  def lineitem: DataFrame   = table("lineitem")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark only reads as a
    * raw long (`spark.sql.legacy.parquet.nanosAsLong=true`, set by our session
    * builders). Normalize to a microsecond TimestampType with integer
    * truncation — same truncation DuckDB applies reading NANOS, so oracle
    * comparisons agree. */
  def events: DataFrame = {
    val raw = table("events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts DIV 1000")))
      case _ => raw
    }
  }
  lazy val documents: DataFrame  = table("documents")
  lazy val embeddings: DataFrame = table("embeddings")
}
