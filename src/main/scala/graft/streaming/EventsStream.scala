package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming / incremental ingestion (SURVEY.md §2.9, ref `convert/plan.go` +
  * `cmd/convert.go:186-228`).
  *
  * The reference is a micro-batch loop: discover → plan → convert, with a
  * grace period for late blocks. Structured Streaming's file source +
  * `Trigger.AvailableNow` is the same control flow with the bookkeeping
  * (which files are new = T6 stateful dedup) handled by checkpointing, and
  * `withWatermark` standing in for the grace/partial-day rules (T2/T3).
  */
object EventsStream {

  /** events schema as the streaming file source sees it when the driver wrote
    * TIMESTAMP(NANOS) parquet (arrives as long under nanosAsLong). Fallback
    * when the source directory can't be probed yet. */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Normalize whatever physical `ts` the files carry to TimestampType (LTZ)
    * — delegates to the single copy in [[graft.sources.Tables.normalizeTs]]. */
  def normalizeTs(df: DataFrame): DataFrame = graft.sources.Tables.normalizeTs(df)

  /** Streaming source over an events directory, ts normalized to µs. A
    * streaming file source needs a fixed schema up front, so it is probed
    * from whatever batch is already present; starting a stream over a
    * not-yet-populated directory must pass `schema` explicitly — silently
    * assuming a shape would misread (or fail on) every later batch whose
    * physical ts type differs. */
  def source(spark: SparkSession, srcDir: String,
             schema: Option[StructType] = None): DataFrame = {
    // only "nothing there yet" maps to the stage-first-batch advice —
    // permission errors, corrupt footers, conflicting schemas are real
    // source problems and must propagate, not masquerade as an empty dir
    val probed =
      try Some(spark.read.parquet(srcDir).schema)
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if Option(e.getCondition).exists(c =>
              c.startsWith("PATH_NOT_FOUND") ||
                c.startsWith("UNABLE_TO_INFER_SCHEMA")) => None
      }
    val resolved = schema.orElse(probed).getOrElse(
      throw new IllegalStateException(
        s"cannot probe a schema from '$srcDir' (no readable files yet); " +
          "stage the first batch before defining the source, or pass schema="))
    normalizeTs(spark.readStream.schema(resolved).parquet(srcDir))
  }

  /** Watermarked tumbling-window counts per metric — the streaming form of
    * the daily-partition ingest aggregation. */
  def windowedCounts(events: DataFrame, window_ : String = "1 day",
                     watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(graft.functions.Det.dec)).cast("double").as("sum_v"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"),
        col("event_type"), col("n"), col("sum_v"))

  /** Run a streaming DataFrame to parquet with AvailableNow (the reference's
    * "convert everything currently discoverable, then stop" batch loop). */
  def runAvailableNow(df: DataFrame, outDir: String, checkpoint: String): StreamingQuery = {
    val q = df.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q
  }

  /** Run to an in-memory table (test/debug sink). */
  def runToMemory(df: DataFrame, name: String, outputMode: String = "append"): StreamingQuery =
    df.writeStream.outputMode(outputMode).format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
}
