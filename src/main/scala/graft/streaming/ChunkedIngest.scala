package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.model.TimeSeriesModel

/** Streaming ingest into the chunk-file layout — the incremental form of
  * the reference's discover→plan→convert loop (`cmd/convert.go:186-228`),
  * with Structured Streaming's checkpointed file source playing the T6
  * "which inputs are new" bookkeeping and `foreachBatch` the convert step.
  *
  * Each micro-batch re-frames ONLY the dates it touches
  * ([[graft.etl.Ingest.mergeChunked]]): existing frames for those dates
  * decode, union with the batch, first-wins sample dedup, re-encode,
  * dynamic-partition overwrite. Per-batch work is proportional to touched
  * dates × their series, never to layout size — the property that keeps a
  * continuously-fed 100 TB layout ingestible. Re-delivered batches are
  * idempotent (the merge dedups at sample grain and the overwrite is
  * by-partition), so at-least-once file-source delivery is safe. */
object ChunkedIngest {

  /** Start an AvailableNow ingest run from a raw events stream (see
    * [[EventsStream.source]]) into `outDir/chunks`. With `downsampleRes`
    * resolutions given, the matching aggregate layers under
    * `outDir/downsample-<res>` are maintained in the same per-batch loop —
    * the streaming form of the Thanos compactor's convert→downsample CHAIN
    * (raw→5m→1h, compact/downsample.go): the finest layer's touched dates
    * recompute from the merged store, and each coarser layer derives from
    * the next finer one ([[graft.etl.Downsample.deriveCoarseDates]]) at
    * 1/(coarse/fine) the rows, never re-reading raw. Per-batch work stays
    * proportional to touched dates, never layout size.
    *
    * `shape` maps a raw micro-batch to the samples schema (default: the
    * events table mapping). A stream whose batches already ARE samples —
    * including native-histogram stores carrying the `h` struct — passes
    * `identity`; histogram rows then maintain their own
    * `downsample-hist-<res>` layers beside the float ones. */
  def run(events: DataFrame, outDir: String, checkpoint: String,
          downsampleRes: Seq[Long] = Nil,
          shape: DataFrame => DataFrame = TimeSeriesModel.samples): StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val (touched, merged) = graft.etl.Ingest.mergeChunkedRetained(spark,
          shape(batch), outDir)
        val resolutions = downsampleRes.distinct.sorted
        try if (resolutions.nonEmpty) {
          // reuse the pinned merge result — the layer refresh must not
          // re-decode the frames the merge just wrote. Layer windows are
          // left-open, so a sample at exactly midnight belongs to the
          // PREVIOUS day's last window: the refreshed WINDOW dates can
          // extend one day before the touched sample dates, and those
          // extra window-dates (plus next-day midnight fragments) must be
          // fed from the store — the batch slice doesn't carry them.
          merged.foreach { m =>
            import org.apache.spark.sql.functions.{col, pmod, lit}
            val winDates = graft.etl.Downsample.touchedWindowDates(m)
            val needFull = winDates.diff(touched)
            val needMid = winDates.map(graft.etl.Downsample.nextDate)
              .distinct.diff(touched ++ needFull)
            val preds = Seq(
              Option.when(needFull.nonEmpty)(col("date").isin(needFull: _*)),
              Option.when(needMid.nonEmpty)(col("date").isin(needMid: _*) &&
                pmod(col("ts_ms"), lit(86400000L)) === 0L)).flatten
            val src =
              if (preds.isEmpty) m
              else m.unionByName(
                graft.etl.Ingest.openChunkedSamples(spark, outDir)
                  .withColumn("date", col("date").cast("string"))
                  .filter(preds.reduce(_ || _)))
            // mixed float/histogram stores maintain BOTH layer families:
            // float rows feed downsample-<res>, h-carrying rows feed
            // downsample-hist-<res> (a struct column must never sweep into
            // the float layer's grouping key, and histogram samples are not
            // float samples)
            val isHist = src.columns.contains("h") &&
              graft.promql.Eval.isHistCol(src, "h")
            val floatSrc = if (isHist) src.filter(col("h").isNull).drop("h")
                           else src
            graft.etl.Downsample.refreshDates(spark,
              floatSrc, s"$outDir/downsample-${resolutions.head}",
              resolutions.head, winDates)
            resolutions.sliding(2).foreach {
              case Seq(fine, coarse) =>
                if (coarse % fine == 0)
                  graft.etl.Downsample.deriveCoarseDates(spark,
                    s"$outDir/downsample-$fine", s"$outDir/downsample-$coarse",
                    fine, coarse, winDates)
                else // non-nesting resolution: recompute from the merge
                  graft.etl.Downsample.refreshDates(spark,
                    floatSrc, s"$outDir/downsample-$coarse", coarse, winDates)
              case _ => ()
            }
            if (isHist) {
              val histSrc = src.filter(col("h").isNotNull)
              graft.etl.Downsample.histRefreshDates(spark,
                histSrc, s"$outDir/downsample-hist-${resolutions.head}",
                resolutions.head, winDates)
              resolutions.sliding(2).foreach {
                case Seq(fine, coarse) =>
                  if (coarse % fine == 0)
                    graft.etl.Downsample.histDeriveCoarseDates(spark,
                      s"$outDir/downsample-hist-$fine",
                      s"$outDir/downsample-hist-$coarse", fine, coarse, winDates)
                  else
                    graft.etl.Downsample.histRefreshDates(spark,
                      histSrc, s"$outDir/downsample-hist-$coarse", coarse, winDates)
                case _ => ()
              }
            }
          }
        } finally merged.foreach(graft.etl.Ingest.releasePinned)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}
