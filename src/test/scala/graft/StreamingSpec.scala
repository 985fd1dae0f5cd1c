package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.streaming.EventsStream

/** Structured-streaming ingest (SURVEY.md §2.9 T1-T6): AvailableNow over the
  * events fixture must produce exactly the batch aggregation. */
class StreamingSpec extends SparkSpec {

  test("AvailableNow windowed counts match the batch equivalent") {
    val src = Files.createTempDirectory("graft-stream-src").toString
    // stage the fixture as a file-source directory
    Tables(spark, sf()).table("events").write.parquet(s"$src/batch1")

    val stream = EventsStream.source(spark, s"$src/batch1")
    val q = EventsStream.runToMemory(
      EventsStream.windowedCounts(stream), "stream_counts")
    q.processAllAvailable(); q.stop()

    val got = spark.table("stream_counts")
      .select("win_start", "win_end", "event_type", "n", "sum_v")

    // append mode only emits windows closed under the final watermark
    // (win_end <= max(ts) − 1h) — the grace-period analog (T2/T3)
    val ev = Tables(spark, sf()).events
    val wmMs = ev.agg(max(unix_millis(col("ts")))).head().getLong(0) - 3600000L
    val batch = ev
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(graft.functions.Det.dec)).cast("double").as("sum_v"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"),
        col("event_type"), col("n"), col("sum_v"))
      .filter(unix_millis(col("win_end")) <= wmMs)

    assert(got.count() > 0)
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty)
  }

  test("incremental: second batch of files is picked up via checkpoint (T6 dedup)") {
    val root = Files.createTempDirectory("graft-stream-inc").toString
    val events = Tables(spark, sf()).table("events")
    events.filter(col("event_id") % 2 === 0).write.parquet(s"$root/src/b0")
    val out = s"$root/out"; val ckpt = s"$root/ckpt"

    val s1 = EventsStream.source(spark, s"$root/src/*")
      .select("event_id", "event_type", "value", "ts")
    EventsStream.runAvailableNow(s1, out, ckpt).awaitTermination()
    val n1 = spark.read.parquet(out).count()

    events.filter(col("event_id") % 2 === 1).write.parquet(s"$root/src/b1")
    EventsStream.runAvailableNow(s1, out, ckpt).awaitTermination()
    val n2 = spark.read.parquet(out).count()

    assert(n1 > 0 && n2 == events.count()) // no reprocessing, no loss
  }
}
