package graft.etl

import java.time.LocalDate
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Top-level conversion round — the reference's `advanceConversion`
  * (`cmd/convert.go:232-330`) re-expressed over the Spark-side pieces:
  *
  *   1. run a TSDB discovery round (block listing + meta filters, S9);
  *   2. read the parquet-side converted-day catalog (`discoverStreamDays`);
  *   3. per external-labels stream, plan the day diff (TSDB-covered days
  *      minus converted days, newest-first, grace + soft cap + optional
  *      live-store watermark — `convert/plan.go:58-178` semantics in
  *      `Planner.planDays`);
  *   4. convert each planned stream's days through the dual-file sink
  *      (`Ingest.convertSamples`, one distributed job per stream).
  *
  * The reference downloads and opens the day's source TSDB blocks on one
  * node; here `loadSamples` yields the stream's samples as a DataFrame and
  * the day filter inside `convertSamples` prunes to the planned days, so
  * block reading, vertical-merge dedup and both sinks run distributed —
  * at 100 TB each step is a cluster job, not a single-node pipeline.
  *
  * Like the reference's `runutil.Repeat` driver, call `advance` from
  * `Loops.repeat` until `RoundResult.converged`.
  */
object ConvertLoop {

  /** Outcome of one round: days planned+converted per stream id. */
  final case class RoundResult(converted: Map[String, Seq[String]]) {
    def converged: Boolean = converted.values.forall(_.isEmpty)
    def stepCount: Int = converted.valuesIterator.map(_.size).sum
  }

  /** [min-day start, max-day end) of a planned day set — the interval a
    * ranged loader may prune chunk refs to (a superset of the plan when
    * the planned days are non-contiguous; the conversion's own day filter
    * stays exact either way). */
  private def planInterval(days: Seq[String]): (Long, Long) = {
    val ds = days.map(d => LocalDate.parse(d).toEpochDay)
    (ds.min * 86400000L, (ds.max + 1) * 86400000L - 1)
  }

  def advance(spark: SparkSession,
              tsdb: TsdbDiscoverer,
              outDir: String,
              today: LocalDate,
              loadSamples: TsdbStream => DataFrame,
              graceDays: Int = 2,
              maxDays: Int = 2,
              watermark: Option[Planner.LiveStoreWatermark] = None,
              loadSamplesRanged: Option[(TsdbStream, Long, Long) => DataFrame] = None): RoundResult = {
    tsdb.discover()
    val convertedDays = Ingest.discoverStreamDays(outDir)
    val result = tsdb.streams.toSeq.sortBy(_._1).map { case (id, stream) =>
      val plan = Planner.planDays(
        stream.days.map(LocalDate.parse).toSet,
        convertedDays.getOrElse(id, Seq.empty).map(LocalDate.parse).toSet,
        today, graceDays, maxDays, watermark)
      if (plan.isEmpty) id -> Seq.empty[String]
      // scopedLoads: this round owns its TSDB index parses — the refs cache
      // a block loader persists during the load is released right after the
      // sink materializes, so concurrent migrations never evict each other
      else graft.sources.TsdbBlockReader.scopedLoads {
        val days = plan.days.map(_.toString)
        val src = loadSamplesRanged.fold(loadSamples(stream)) { f =>
          val (lo, hi) = planInterval(days); f(stream, lo, hi)
        }
        Ingest.convertSamples(spark, src, outDir,
          days = Some(days), externalLabels = stream.externalLabels)
        id -> days
      }
    }
    RoundResult(result.toMap)
  }

  /** [[advance]] with the REFERENCE dual-file layout as the sink: the same
    * discovery→plan→convert round, but each planned day lands as the
    * reference's own `<extHash>/<date>/<shard>.{labels,chunks}.parquet` +
    * `meta.pb` (+ `stream.pb` per stream) — a continuous TSDB→gateway-bucket
    * migration loop the reference's `convert` command runs natively
    * (`cmd/convert.go:232-330`). Converted-day state is read back from the
    * bucket's meta.pb files, so the loop resumes from the bucket alone.
    * Round keys are ext-labels-hash strings (the bucket's directory names). */
  def advanceReference(spark: SparkSession,
                       tsdb: TsdbDiscoverer,
                       outDir: String,
                       today: LocalDate,
                       loadSamples: TsdbStream => DataFrame,
                       graceDays: Int = 2,
                       maxDays: Int = 2,
                       numShards: Int = 1,
                       watermark: Option[Planner.LiveStoreWatermark] = None,
                       retentionDays: Option[Int] = None,
                       consistencyDelayMs: Long = 12L * 3600 * 1000,
                       nowMs: () => Long = () => System.currentTimeMillis(),
                       loadSamplesRanged: Option[(TsdbStream, Long, Long) => DataFrame] = None): RoundResult = {
    tsdb.discover()
    val convertedDays = ReferenceFormat.discoverDays(spark, outDir)
    // bucket identity is the EXT-LABELS HASH (the directory name): streams
    // sharing one external label set share one bucket, so they convert as a
    // UNION — converting them separately would let the second stream's
    // day-overwrite clobber the first's freshly written files
    val byHash = tsdb.streams.toSeq.sortBy(_._1).groupBy { case (_, s) =>
      java.lang.Long.toUnsignedString(
        ReferenceFormat.externalLabelsHash(s.externalLabels))
    }
    val result = byHash.toSeq.sortBy(_._1).map { case (eh, members) =>
      val plan = Planner.planDays(
        members.flatMap(_._2.days).map(LocalDate.parse).toSet,
        convertedDays.getOrElse(eh, Seq.empty).map(LocalDate.parse).toSet,
        today, graceDays, maxDays, watermark)
      if (plan.isEmpty) eh -> Seq.empty[String]
      else graft.sources.TsdbBlockReader.scopedLoads {
        val days = plan.days.map(_.toString)
        def load(s: TsdbStream): DataFrame =
          loadSamplesRanged.fold(loadSamples(s)) { f =>
            val (lo, hi) = planInterval(days); f(s, lo, hi)
          }
        val union = members.map(m => load(m._2))
          .reduce(_.unionByName(_, allowMissingColumns = true))
        ReferenceFormat.convertReference(spark, union, outDir,
          externalLabels = members.head._2.externalLabels, numShards = numShards,
          days = Some(days))
        eh -> days
      }
    }
    // retention rides the same round, as the reference's cron does
    // (locate/deletion.go:132-169 mark; :40-103 delete after the 12h
    // consistency delay): expired days turn undiscoverable at mark time —
    // so the NEXT round's planner won't resurrect them — and their files
    // drop once the marker has aged past the delay
    retentionDays.foreach { rd =>
      ReferenceFormat.markExpiredDays(spark, outDir, today.minusDays(rd.toLong).toString)
      ReferenceFormat.deleteMarkedDays(spark, outDir, nowMs(), consistencyDelayMs)
    }
    RoundResult(result.toMap)
  }
}
