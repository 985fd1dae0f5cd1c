package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Det

/** Thanos-style downsampling layers for the converted layout.
  *
  * Thanos compacts raw blocks into 5m/1h resolution blocks whose chunks store
  * five aggregates per window — count/sum/min/max/counter — so long-range
  * queries read ~240× fewer samples (ref thanos compact/downsample.go; the
  * parquet-gateway serves those blocks like any other). Spark-first form: the
  * layer is ONE aggregation over the samples view, grouped by (series, aligned
  * window) — partial aggregation map-side, one shuffle at (series × window)
  * grain, never a global sort. At 100 TB the 1h layer is ~1/240th of raw at
  * 15s cadence, and every `*_over_time`/rate whose step is coarse enough reads
  * the layer instead of raw.
  *
  * Counter semantics are preserved EXACTLY, not approximately: each window
  * stores its first/last sample (with timestamps) plus the decimal sum of
  * in-window counter drops; cross-window resets are recovered at read time by
  * comparing a window's `first_v` with the previous window's `last_v`. The sum
  * of (in-window + boundary) drop terms is the same term multiset a raw scan
  * sees, and decimal addition is associative, so layer-recomposed increase ==
  * raw increase bit-for-bit (EtlSpec pins this).
  */
object Downsample {

  /** Thanos' two downsampled resolutions (compact/downsample.go:40-44). */
  val Res5m: Long = 300000L
  val Res1h: Long = 3600000L

  private val bookkeeping = Set("ts_ms", "value", "sample_id", "series_hash", "date")

  // Adding two DECIMAL(38,9) in Spark widens to (38,8) — max(p1-s1,p2-s2)+s+1
  // = 39 overflows, so the scale is sacrificed and the 9th decimal rounds at
  // whichever point the addition happens, breaking bit-identity between
  // recomposition paths. Keep addition operands at (37,9)+(28,9) → (38,9):
  // exact while a single boundary term stays under 1e19 (decTerm) and a
  // window's accumulated drops under 1e28 (decWide) — doubles lose integer
  // precision far earlier, and decOrFail errors loudly rather than letting
  // an overflow NULL vanish from the sums.
  private val decWide = org.apache.spark.sql.types.DecimalType(37, 9)
  private val decTerm = org.apache.spark.sql.types.DecimalType(28, 9)

  /** Decimal cast that fails loudly: an overflowing (or NaN) term casts to
    * NULL under non-ANSI mode, and NULL would silently vanish from the drop
    * sums — corrupting the recomposition identities instead of erroring.
    * coalesce evaluates lazily, so the error fires only on actual NULL. */
  private def decOrFail(c: org.apache.spark.sql.Column,
                        t: org.apache.spark.sql.types.DecimalType) =
    coalesce(c.cast(t),
      raise_error(concat(lit("downsample term outside DECIMAL range (or NaN): "),
        c.cast("string"))).cast(t))

  /** Build the aggregate layer at `resMs` from a samples view
    * (`series_hash, <labels…>, ts_ms, value, sample_id`). One row per
    * (series, aligned window); `drop_sum` stays DECIMAL so a second-stage
    * reduction over windows is still exact. */
  def layer(samples: DataFrame, resMs: Long): DataFrame = {
    val lbls = samples.columns.filterNot(bookkeeping).toSeq
    val w = Window.partitionBy(col("series_hash"), col("win_start"))
      .orderBy(col("ts_ms"), col("sample_id"))
    val ord = struct(col("ts_ms"), col("sample_id"))
    val dropTerm = when(
      col("__graft_prev").isNotNull && col("value") < col("__graft_prev"),
      col("__graft_prev") - col("value")).otherwise(lit(0.0))
    samples
      .withColumn("win_start", col("ts_ms") - pmod(col("ts_ms"), lit(resMs)))
      .withColumn("__graft_prev", lag(col("value"), 1).over(w))
      .groupBy((col("series_hash") +: col("win_start") +: lbls.map(col)): _*)
      .agg(
        count(lit(1)).as("n"),
        // sum_v and drop_sum stay DECIMAL so coarser recompositions
        // ([[overTime]], [[counterIncrease]]) re-reduce without double
        // rounding; presentation edges cast once. Layers hold counter/gauge
        // metrics where NaN does not occur (staleness markers are filtered
        // at ingest) — a NaN sample fails loudly via decOrFail.
        sum(decOrFail(col("value"), Det.dec)).as("sum_v"),
        min(col("value")).as("min_v"),
        max(col("value")).as("max_v"),
        min_by(col("value"), ord).as("first_v"),
        min(col("ts_ms")).as("first_ts"),
        max_by(col("value"), ord).as("last_v"),
        max(col("ts_ms")).as("last_ts"),
        sum(decOrFail(dropTerm, Det.dec)).as("drop_sum"))
  }

  /** Recompose the layer at a coarser aligned window whose width is a
    * multiple of the layer resolution — the read path for
    * `count/sum/min/max/first/last_over_time` and per-window increase on
    * long-range grids. Every aggregate (including the drop accounting, via
    * boundary resets between constituent windows) reduces exactly, so the
    * result is bit-identical to building the coarse layer from raw
    * (EtlSpec pins `overTime(layer(1h), 6h) == layer(6h)`). */
  def overTime(layer: DataFrame, windowMs: Long, resMs: Long): DataFrame = {
    require(windowMs % resMs == 0L,
      s"coarse window $windowMs must be a multiple of the layer resolution $resMs")
    val lbls = layer.columns.filterNot(bookkeeping ++ Set(
      "win_start", "n", "sum_v", "min_v", "max_v",
      "first_v", "first_ts", "last_v", "last_ts", "drop_sum")).toSeq
    val w = Window.partitionBy(col("series_hash"), col("__graft_cw"))
      .orderBy(col("win_start"))
    val boundary = when(
      col("__graft_prev_last").isNotNull && col("first_v") < col("__graft_prev_last"),
      col("__graft_prev_last") - col("first_v")).otherwise(lit(0.0))
    layer
      .withColumn("__graft_cw", col("win_start") - pmod(col("win_start"), lit(windowMs)))
      .withColumn("__graft_prev_last", lag(col("last_v"), 1).over(w))
      .groupBy((col("series_hash") +: col("__graft_cw").as("win_start") +: lbls.map(col)): _*)
      .agg(
        sum(col("n")).as("n"),
        sum(col("sum_v")).as("sum_v"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"),
        min_by(col("first_v"), col("first_ts")).as("first_v"),
        min(col("first_ts")).as("first_ts"),
        max_by(col("last_v"), col("last_ts")).as("last_v"),
        max(col("last_ts")).as("last_ts"),
        sum(decOrFail(col("drop_sum"), decWide) + decOrFail(boundary, decTerm))
          .cast(Det.dec).as("drop_sum"))
  }

  /** Reset-aware counter increase per series over the whole layer — the read
    * path a long-range `increase()`/`rate()` takes against a downsampled
    * layer. Boundary resets (window k's first below window k-1's last) are
    * the cross-window drop terms the per-window `drop_sum` cannot see; both
    * stay decimal until the single final cast, so the result equals the raw
    * scan exactly. */
  def counterIncrease(layer: DataFrame): DataFrame = {
    val lbls = layer.columns.filterNot(bookkeeping ++ Set(
      "win_start", "n", "sum_v", "min_v", "max_v",
      "first_v", "first_ts", "last_v", "last_ts", "drop_sum")).toSeq
    val w = Window.partitionBy(col("series_hash")).orderBy(col("win_start"))
    val boundary = when(
      col("__graft_prev_last").isNotNull && col("first_v") < col("__graft_prev_last"),
      col("__graft_prev_last") - col("first_v")).otherwise(lit(0.0))
    layer
      .withColumn("__graft_prev_last", lag(col("last_v"), 1).over(w))
      .withColumn("__graft_boundary", decOrFail(boundary, decTerm))
      .groupBy((col("series_hash") +: lbls.map(col)): _*)
      .agg(
        min_by(col("first_v"), col("win_start")).as("__graft_first"),
        max_by(col("last_v"), col("win_start")).as("__graft_last"),
        sum(decOrFail(col("drop_sum"), decWide) + col("__graft_boundary")).as("__graft_drops"))
      .select((lbls.map(col) :+
        ((col("__graft_last") - col("__graft_first")) +
          col("__graft_drops").cast("double")).as("inc")): _*)
  }

  /** Thanos' auto-downsampling rule (query/querier.go): read the coarsest
    * layer whose resolution still gives ≥5 windows per step. */
  def pick(stepMs: Long): Long =
    if (stepMs >= 5 * Res1h) Res1h
    else if (stepMs >= 5 * Res5m) Res5m
    else 0L

  /** Persist a layer next to the converted layout, range-sharded by series so
    * a matcher select touches few files (same discipline as Ingest's sorted
    * sharded write). */
  def writeLayer(layer: DataFrame, outDir: String): Unit =
    layer
      .repartitionByRange(col("series_hash"), col("win_start"))
      .sortWithinPartitions(col("series_hash"), col("win_start"))
      .write.mode("overwrite").parquet(outDir)

  def openLayer(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir)

  /** Incrementally maintain a date-partitioned layer: recompute ONLY the
    * touched dates from the (already-merged) sample store and dynamically
    * overwrite those partitions. Both supported resolutions divide a day, so
    * a window never crosses a date boundary and per-date recompute is exact.
    * Work per refresh ∝ touched dates × their series — the same property
    * that keeps [[Ingest.mergeChunked]] ingestible at 100 TB; re-running on
    * a re-delivered batch is idempotent (same inputs → same partitions). */
  def refreshDates(spark: SparkSession, samples: DataFrame, layerDir: String,
                   resMs: Long, dates: Seq[String]): Unit = {
    if (dates.isEmpty) return
    require(86400000L % resMs == 0L,
      s"layer resolution $resMs must divide a day for per-date maintenance")
    val part = layer(samples.filter(col("date").isin(dates: _*)).drop("date"), resMs)
      .withColumn("date", date_format(timestamp_millis(col("win_start")), "yyyy-MM-dd"))
    part
      .repartitionByRange(col("date"), col("series_hash"), col("win_start"))
      .sortWithinPartitions(col("date"), col("series_hash"), col("win_start"))
      .write.mode("overwrite").partitionBy("date")
      .option("partitionOverwriteMode", "dynamic")
      .option("compression", "zstd")
      .parquet(layerDir)
  }
}
