package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.streaming.{ChunkedIngest, EventsStream}

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

  test("stateful sessionization (flatMapGroupsWithState) equals batch gap sessions") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val root = Files.createTempDirectory("graft-sess").toString
    val events = Tables(spark, sf()).table("events")
    events.write.parquet(s"$root/src/b0")
    val gap = 1800000L

    val src = EventsStream.source(spark, s"$root/src/*")
    val q = graft.streaming.Sessionize.sessions(src, gap).toDF()
      .writeStream.outputMode("append").format("memory").queryName("sessions")
      .start()
    q.processAllAvailable()

    // a far-future sentinel event pushes the watermark past every real
    // session, firing the EventTimeTimeout for each still-open one. Build the
    // sentinel in the SAME physical ts shape as the staged files so the probed
    // file-source schema still reads b1.
    val maxTsMs = Tables(spark, sf()).events
      .agg(max(unix_millis(col("ts")))).head().getLong(0)
    val farMs = maxTsMs + 10L * 86400L * 1000L
    val sentinelTs = events.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => lit(farMs * 1000000L)
      case org.apache.spark.sql.types.TimestampNTZType =>
        timestamp_millis(lit(farMs)).cast(org.apache.spark.sql.types.TimestampNTZType)
      case _ => timestamp_millis(lit(farMs))
    }
    spark.range(1).select(lit(-1L).as("event_id"), sentinelTs.as("ts"),
        lit(-1L).as("user_id"), lit("x").as("event_type"),
        lit(0.0).as("value"), lit("").as("props"))
      .select(events.schema.fieldNames.map(col).toIndexedSeq: _*)
      .write.mode("append").parquet(s"$root/src/b1")
    q.processAllAvailable(); q.stop()

    val got = spark.table("sessions").filter($"uid" >= 0)
      .select($"uid", $"sess_start", $"sess_end", $"n_events")
      .as[(Long, Long, Long, Long)].collect().toSet

    val w = Window.partitionBy($"user_id").orderBy($"ts_ms", $"event_id")
    val batch = Tables(spark, sf()).events
      .select($"user_id", $"event_id", unix_millis($"ts").as("ts_ms"))
      .withColumn("prev_ts", lag($"ts_ms", 1).over(w))
      .withColumn("new_sess",
        when($"prev_ts".isNull || $"ts_ms" - $"prev_ts" > gap, 1).otherwise(0))
      .withColumn("sess_no",
        sum($"new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($"user_id", $"sess_no")
      .agg(min($"ts_ms").as("s"), max($"ts_ms").as("e"), count(lit(1)).as("n"))
      .select($"user_id", $"s", $"e", $"n")
      .as[(Long, Long, Long, Long)].collect().toSet

    assert(got.nonEmpty && got == batch)
  }

  test("multi-batch sessionize: carried-over state emits each session exactly once") {
    // ADVICE regression: open a session with a pending event-time timeout in
    // batch 1, then in batch 2 let the watermark be far past end+gap while new
    // events for the same user arrive. The carried session must be emitted
    // exactly once (by the gap branch that closes it inline) and the stale
    // batch-1 timeout must not re-fire it; the replacement session finalizes
    // once via timeout when batch 3 advances the watermark.
    //
    // Note on reachability: FlatMapGroupsWithStateExec drops input rows older
    // than the watermark, so a row behind the watermark (user 7 @ 8s below)
    // never reaches the function — carried state therefore finalizes via the
    // timeout or gap branch, and the foreach inline-finalize is a defensive
    // guard. This test pins the exactly-once outcome across the interleaving
    // either way.
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val gap = 10000L // 10s
    val in = MemoryStream[(Long, java.sql.Timestamp)](spark, 1)
    val q = graft.streaming.Sessionize.sessions(
        in.toDF().toDF("user_id", "ts"), gap).toDF()
      .writeStream.outputMode("append").format("memory").queryName("sess_mb")
      .start()
    def ev(uid: Long, sec: Long) = (uid, new java.sql.Timestamp(sec * 1000L))

    in.addData(ev(7, 5), ev(99, 1000)) // user 7 opens (timeout 15s); wm → 1000s
    q.processAllAvailable()
    // batch 2: user 7's pending timeout (15s) is long expired relative to the
    // watermark (1000s); same batch delivers a late row (dropped) and a fresh
    // event that closes the old session by gap and opens a new one
    in.addData(ev(7, 8), ev(7, 2000), ev(99, 2001))
    q.processAllAvailable()
    in.addData(ev(99, 4000)) // wm → 4000s: finalizes (2000,2000); a stale
    q.processAllAvailable(); q.stop() // batch-1 timeout would re-emit (5,5)

    val u7 = spark.table("sess_mb").filter($"uid" === 7)
      .select($"sess_start", $"sess_end", $"n_events")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(u7 == Seq((5000L, 5000L, 1L), (2000000L, 2000000L, 1L)).sorted,
      s"expected each session exactly once, got $u7")
  }

  test("streaming exact dedup: re-delivered keys within the watermark emit once") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val in = MemoryStream[(Long, java.sql.Timestamp)](spark, 1)
    val q = graft.streaming.Dedup.exactOnce(
        in.toDF().toDF("doc_key", "ts"), Seq("doc_key"), "ts", "1 hour")
      .writeStream.outputMode("append").format("memory").queryName("dedup_s")
      .start()
    def ev(k: Long, sec: Long) = (k, new java.sql.Timestamp(sec * 1000L))

    in.addData(ev(1, 10), ev(2, 20), ev(2, 25), ev(3, 30)) // in-batch dup of 2
    q.processAllAvailable()
    in.addData(ev(2, 40), ev(4, 50)) // cross-batch re-delivery of 2
    q.processAllAvailable(); q.stop()

    val keys = spark.table("dedup_s").select($"doc_key")
      .as[Long].collect().toSeq
    assert(keys.sorted == Seq(1L, 2L, 3L, 4L), s"got $keys")
  }

  test("streaming corpus dedup: content fingerprint + watermark collapses near-identical re-deliveries") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // streaming form of the batch tx_fingerprint ∘ dd_exact composition:
    // fingerprint is whitespace/case-normalized, so a re-crawled page that
    // only changed spacing dedups against the original
    val in = MemoryStream[(Long, String, java.sql.Timestamp)](spark, 2)
    val docs = in.toDF().toDF("doc_id", "text", "ts")
      .withColumn("fp", conv(substring(md5(
        lower(regexp_replace(trim(col("text")), "\\s+", " "))), 1, 12), 16, 10)
        .cast("long"))
    val q = graft.streaming.Dedup.exactOnce(docs, Seq("fp"), "ts", "1 hour")
      .writeStream.outputMode("append").format("memory").queryName("doc_dedup_s")
      .start()
    def doc(id: Long, text: String, sec: Long) =
      (id, text, new java.sql.Timestamp(sec * 1000L))

    in.addData(
      doc(1, "the quick brown fox", 10),
      doc(2, "THE  quick   Brown fox ", 20), // normalizes to doc 1
      doc(3, "a different document", 30))
    q.processAllAvailable()
    in.addData(doc(4, "the quick brown fox", 40)) // cross-batch re-delivery
    q.processAllAvailable(); q.stop()

    val ids = spark.table("doc_dedup_s").select($"doc_id").as[Long].collect().toSeq
    assert(ids.sorted == Seq(1L, 3L), s"got $ids")
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

  test("streaming chunked ingest: per-batch merge re-frames only touched dates, idempotent on overlap") {
    import graft.etl.Ingest
    val root = Files.createTempDirectory("graft-stream-chunk").toString
    val t = Tables(spark, sf())
    val events = t.table("events") // raw file shape for the source dirs
    val out = s"$root/layout"; val ckpt = s"$root/ckpt"

    // batch 1: even events — staged BEFORE the source is defined so the
    // file-source schema probe sees the real physical ts shape
    events.filter(col("event_id") % 2 === 0).write.parquet(s"$root/src/b0")
    val src = EventsStream.source(spark, s"$root/src/*")
    ChunkedIngest.run(src, out, ckpt).awaitTermination()
    val n1 = Ingest.openChunkedSamples(spark, out).count()
    assert(n1 == events.filter(col("event_id") % 2 === 0).count())

    // batch 2: odd events PLUS re-delivered evens (at-least-once overlap)
    events.filter(col("event_id") % 2 === 1 || col("event_id") % 4 === 0)
      .write.parquet(s"$root/src/b1")
    ChunkedIngest.run(src, out, ckpt).awaitTermination()

    // the layout converges to exactly the distinct sample set
    val got = Ingest.openChunkedSamples(spark, out)
    assert(got.count() == events.count())
    val want = graft.model.TimeSeriesModel.samples(t.events)
      .select("series_hash", "ts_ms", "value")
    assert(got.select("series_hash", "ts_ms", "value")
      .exceptAll(want).isEmpty && want.exceptAll(
        got.select("series_hash", "ts_ms", "value")).isEmpty)

    // frame invariants survive the merge: windows bounded, one frame per
    // (series, window, date)
    val frames = spark.read.parquet(s"$out/chunks")
    assert(frames.filter(col("maxt") - col("mint") >= 8L * 3600 * 1000).count() == 0)
    assert(frames.groupBy("date", "series_hash", "win").count()
      .filter(col("count") > 1).count() == 0)
  }

  test("streaming downsample maintenance: per-date refresh equals a full layer recompute") {
    import graft.etl.{Downsample, Ingest}
    val root = Files.createTempDirectory("graft-stream-ds").toString
    val events = Tables(spark, sf()).table("events")
    val out = s"$root/layout"; val ckpt = s"$root/ckpt"

    events.filter(col("event_id") % 2 === 0).write.parquet(s"$root/src/b0")
    val src = EventsStream.source(spark, s"$root/src/*")
    val resolutions = Seq(Downsample.Res5m, Downsample.Res1h)
    ChunkedIngest.run(src, out, ckpt, resolutions).awaitTermination()

    // batch 2 includes re-delivered evens (at-least-once overlap)
    events.filter(col("event_id") % 2 === 1 || col("event_id") % 4 === 0)
      .write.parquet(s"$root/src/b1")
    ChunkedIngest.run(src, out, ckpt, resolutions).awaitTermination()

    // both layers of the compactor chain — the 1h one DERIVED from the 5m
    // one, never from raw — must equal a from-scratch rebuild off the store
    for (res <- resolutions) {
      val maintained = Downsample
        .openLayer(spark, s"$out/downsample-$res").drop("date")
      val full = Downsample.layer(
        Ingest.openChunkedSamples(spark, out).drop("date"), res)
      assert(maintained.count() == full.count() && maintained.count() > 0,
        s"res=$res")
      assert(maintained.exceptAll(full).isEmpty && full.exceptAll(maintained).isEmpty,
        s"res=$res chain-maintained layer must equal a full recompute")
    }
  }

  test("streaming maintains HISTOGRAM layers beside float layers on a mixed store") {
    import spark.implicits._
    import graft.etl.{Downsample, Ingest}
    val root = Files.createTempDirectory("graft-stream-hds").toString
    val out = s"$root/layout"; val ckpt = s"$root/ckpt"
    val T0 = 1704067200000L
    val histType = graft.functions.HistChunk.HistType

    // mixed samples: a cumulative histogram series + a float series
    def mixed(filterExpr: org.apache.spark.sql.Column): org.apache.spark.sql.DataFrame = {
      val hist = (0 until 120).map(i => ("hm", "1", T0 + i * 1730000L, i.toDouble, i.toLong)).toSeq
        .toDF("__name__", "uid", "ts_ms", "value", "sample_id")
        .withColumn("series_hash", xxhash64(col("__name__"), col("uid")))
        .withColumn("h", struct(col("value").as("cnt"), (col("value") * 1.5).as("hsum"),
          lit(0).as("sch"), lit(0.001953125).as("zthr"), lit(0.0).as("zcnt"),
          array(struct(lit(1).as("idx"), col("value").as("c"))).as("pos"),
          array().cast("array<struct<idx:int,c:double>>").as("neg"), lit(null).cast("array<double>").as("cb")))
      val flt = (0 until 120).map(i => ("fm", "2", T0 + i * 1490000L, i * 2.0, 1000L + i)).toSeq
        .toDF("__name__", "uid", "ts_ms", "value", "sample_id")
        .withColumn("series_hash", xxhash64(col("__name__"), col("uid")))
        .withColumn("h", lit(null).cast(histType))
      hist.unionByName(flt).filter(filterExpr)
    }

    val resolutions = Seq(Downsample.Res5m, Downsample.Res1h)
    // batch 0: even sample ids; batch 1: odds + re-delivered evens
    mixed(col("sample_id") % 2 === 0).write.parquet(s"$root/src/b0")
    val src = spark.readStream.schema(mixed(lit(true)).schema).parquet(s"$root/src/*")
    ChunkedIngest.run(src, out, ckpt, resolutions,
      shape = identity).awaitTermination()
    mixed(col("sample_id") % 2 === 1 || col("sample_id") % 4 === 0)
      .write.parquet(s"$root/src/b1")
    ChunkedIngest.run(spark.readStream.schema(mixed(lit(true)).schema)
      .parquet(s"$root/src/*"), out, ckpt, resolutions,
      shape = identity).awaitTermination()

    val store = Ingest.openChunkedSamples(spark, out).drop("date")
    for (res <- resolutions) {
      // float layers hold ONLY the float rows
      val fl = Downsample.openLayer(spark, s"$out/downsample-$res").drop("date")
      val flWant = Downsample.layer(store.filter(col("h").isNull).drop("h"), res)
      assert(fl.count() == flWant.count() && fl.count() > 0, s"res=$res")
      assert(fl.exceptAll(flWant).isEmpty && flWant.exceptAll(fl).isEmpty, s"res=$res")
      // histogram layers (the 1h one DERIVED via histOverTime) equal a
      // from-scratch histLayer rebuild off the merged store
      val hl = Downsample.openLayer(spark, s"$out/downsample-hist-$res").drop("date")
      val hlWant = Downsample.histLayer(store, res)
      assert(hl.count() == hlWant.count() && hl.count() > 0, s"hist res=$res")
      assert(hl.exceptAll(hlWant).isEmpty && hlWant.exceptAll(hl).isEmpty,
        s"hist res=$res chain-maintained layer must equal a full recompute")
    }
    // serve-time wiring picks BOTH families up
    assert(Downsample.discoverLayers(spark, out).keySet == resolutions.toSet)
    assert(Downsample.discoverHistLayers(spark, out).keySet == resolutions.toSet)
  }
}
