package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * **Windows are LEFT-OPEN `(w, w+res]`** — a sample at ts belongs to the
  * window whose exclusive lower bound is below it. This matches PromQL's
  * range selector `(t-range, t]` exactly: when a query's window and grid
  * steps are aligned to the resolution, the selector is partitioned by whole
  * layer windows with no boundary sample double-counted or dropped. That
  * alignment is what lets the engine ([[graft.promql.LayerRoute]]) serve
  * `rate`/`increase`/`*_over_time` from a layer BIT-EXACTLY, where Thanos'
  * closed-open downsample windows make the querier's auto-downsampled
  * answers approximate at window edges.
  *
  * Counter semantics are preserved EXACTLY, not approximately: each window
  * stores its first/last sample (with timestamps) plus two decimal reset
  * accumulations over in-window consecutive pairs —
  *
  *  - `drop_sum`  = Σ (prev − value) at drops: recomposes a MONOTONE total
  *    increase ([[counterIncrease]], treating each reset as zero increase);
  *  - `reset_sum` = Σ prev at drops: Prometheus' counter-reset correction
  *    (promql/functions.go extrapolatedRate adds the pre-reset value), the
  *    term the engine's raw `rate`/`increase` path accumulates —
  *
  * plus pair counts `n_resets`/`n_changes` for `resets()`/`changes()`.
  * Cross-window pairs are recovered at read time by comparing a window's
  * `first_v` with the previous window's `last_v`; the recomposed term
  * multiset equals what a raw scan sees, and decimal addition is
  * associative, so layer-recomposed results match raw bit-for-bit (EtlSpec
  * and LayerRouteSpec pin this).
  */
object Downsample {

  /** Thanos' two downsampled resolutions (compact/downsample.go:40-44). */
  val Res5m: Long = 300000L
  val Res1h: Long = 3600000L

  /** Layer FORMAT version, stamped as `_graft_layer_version` beside every
    * persisted layer (underscore-prefixed, so Spark's file index treats it
    * as metadata and never reads it as data). Version 2 = left-open windows
    * + reset/change pair accounting + last2 pair columns. Version 3 =
    * zero-threshold-aware reset detection (a zthr decrease is a reset; a
    * zthr increase folds prev's inside buckets before comparing) — the
    * persisted histogram-layer reset lists depend on detectReset, so the
    * semantics change forces a rebuild. A semantic change
    * to the window convention or the aggregate set MUST bump this:
    * [[discoverLayers]] skips dirs whose marker is missing or different, so
    * stale layouts are rebuilt rather than silently served with the wrong
    * semantics (the marker is the version gate; [[graft.promql.LayerRoute]]
    * additionally declines frames missing required columns). */
  val LayerFormatVersion: Int = 3
  private val VersionMarker = "_graft_layer_version"

  private def stampVersion(spark: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir, VersionMarker)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(LayerFormatVersion.toString.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def versionOf(dir: java.nio.file.Path): Option[Int] = {
    val m = dir.resolve(VersionMarker)
    if (!java.nio.file.Files.isRegularFile(m)) None
    else scala.util.Try(new String(java.nio.file.Files.readAllBytes(m),
      java.nio.charset.StandardCharsets.UTF_8).trim.toInt).toOption
  }

  /** Admission-stats sidecar, `Σn rows`, stamped beside the version marker
    * by [[writeLayer]] so [[graft.promql.LayerRoute.benefit]] admits a layer
    * WITHOUT a planning-time aggregate job — at 100 TB the probe is a full
    * scan of the layer's `n` column blocking first-query planning.
    * Incremental refreshes ([[refreshDates]]) leave an existing sidecar in
    * place: the ratio is a per-window density property (cadence × res), so
    * Σn and rows drift proportionally and the quotient stays honest; a
    * layer maintained ONLY incrementally simply has no sidecar and falls
    * back to the probe. */
  private val StatsMarker = "_graft_layer_stats"

  /** A layer directory whose version marker is missing or different is
    * SKIPPED (stale semantics must not serve), but silently losing
    * auto-downsampling would look like a perf regression with no signal —
    * name the directory and versions so operators learn a rebuild is due. */
  private def warnStaleLayer(dir: java.nio.file.Path): Unit =
    org.slf4j.LoggerFactory.getLogger(getClass).warn(
      "skipping layer directory {}: found version marker {} but this build " +
        "requires {} — queries fall back to raw scans until the layer is rebuilt",
      dir.toString, versionOf(dir).map(_.toString).getOrElse("<none>"),
      LayerFormatVersion.toString)

  private def stampStats(spark: SparkSession, dir: String,
                         sumN: Long, rows: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir, StatsMarker)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(s"$sumN $rows".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private[graft] def statsOf(dir: java.nio.file.Path): Option[(Long, Long)] = {
    val m = dir.resolve(StatsMarker)
    if (!java.nio.file.Files.isRegularFile(m)) None
    else scala.util.Try {
      val Array(s, r) = new String(java.nio.file.Files.readAllBytes(m),
        java.nio.charset.StandardCharsets.UTF_8).trim.split(" ")
      (s.toLong, r.toLong)
    }.toOption
  }

  private val bookkeeping = Set("ts_ms", "value", "sample_id", "series_hash", "date")

  /** Everything a layer row carries besides its label columns. */
  val layerCols: Set[String] = Set("win_start", "n", "sum_v", "min_v", "max_v",
    "first_v", "first_ts", "last_v", "last_ts", "drop_sum", "reset_sum",
    "n_resets", "n_changes", "last2_v", "last2_ts")

  // Adding two DECIMAL(38,9) in Spark widens to (38,8) — max(p1-s1,p2-s2)+s+1
  // = 39 overflows, so the scale is sacrificed and the 9th decimal rounds at
  // whichever point the addition happens, breaking bit-identity between
  // recomposition paths. Keep addition operands at (37,9)+(28,9) → (38,9):
  // exact while a single boundary term stays under 1e19 (decTerm) and a
  // window's accumulated drops under 1e28 (decWide) — doubles lose integer
  // precision far earlier, and decOrFail errors loudly rather than letting
  // an overflow NULL vanish from the sums.
  private[graft] val decWide = org.apache.spark.sql.types.DecimalType(37, 9)
  private[graft] val decTerm = org.apache.spark.sql.types.DecimalType(28, 9)

  /** Decimal cast that fails loudly: an overflowing (or NaN) term casts to
    * NULL under non-ANSI mode, and NULL would silently vanish from the drop
    * sums — corrupting the recomposition identities instead of erroring.
    * coalesce evaluates lazily, so the error fires only on actual NULL. */
  private[graft] def decOrFail(c: Column,
                               t: org.apache.spark.sql.types.DecimalType) =
    coalesce(c.cast(t),
      raise_error(concat(lit("downsample term outside DECIMAL range (or NaN): "),
        c.cast("string"))).cast(t))

  /** Same loud-failure discipline for the AGGREGATED sums: `sum` over
    * decimals can itself overflow to NULL under non-ANSI mode, and a layer
    * served directly would then carry silent NULL `sum_v`/`drop_sum`. The
    * per-group inputs are non-null (decOrFail'd), so a NULL sum can only
    * mean overflow. */
  private def sumOrFail(c: Column, what: String): Column =
    coalesce(sum(c),
      raise_error(lit(s"downsample $what sum overflowed DECIMAL " +
        "(window too wide for the value magnitude)")).cast(Det.dec))

  /** Left-open window assignment: ts ∈ (win_start, win_start + res]. */
  def winStartOf(ts: Column, resMs: Long): Column =
    (ts - 1) - pmod(ts - 1, lit(resMs))

  /** Build the aggregate layer at `resMs` from a samples view
    * (`series_hash, <labels…>, ts_ms, value, sample_id`). One row per
    * (series, aligned window); the decimal accumulations stay DECIMAL so a
    * second-stage reduction over windows is still exact. Staleness markers
    * are not samples (Prometheus matrix selection skips them) — filtering
    * them here keeps the layer's pairs identical to the raw query path's. */
  def layer(samples: DataFrame, resMs: Long): DataFrame = {
    samples.schema.fields.find(f =>
      f.dataType.isInstanceOf[org.apache.spark.sql.types.StructType]).foreach { f =>
      throw new IllegalArgumentException(
        s"downsample layers hold float samples; struct column '${f.name}' " +
          "(native-histogram?) would be swept into the grouping key — drop it")
    }
    val lbls = samples.columns.filterNot(bookkeeping).toSeq
    val w = Window.partitionBy(col("series_hash"), col("win_start"))
      .orderBy(col("ts_ms"), col("sample_id"))
    val ord = struct(col("ts_ms"), col("sample_id"))
    val isDrop = col("__graft_prev").isNotNull && col("value") < col("__graft_prev")
    val dropTerm = when(isDrop, col("__graft_prev") - col("value")).otherwise(lit(0.0))
    val resetTerm = when(isDrop, col("__graft_prev")).otherwise(lit(0.0))
    samples
      .filter(!graft.functions.IsStale(col("value")))
      .withColumn("win_start", winStartOf(col("ts_ms"), resMs))
      .withColumn("__graft_prev", lag(col("value"), 1).over(w))
      .withColumn("__graft_prev_ts", lag(col("ts_ms"), 1).over(w))
      .groupBy((col("series_hash") +: col("win_start") +: lbls.map(col)): _*)
      .agg(
        count(lit(1)).as("n"),
        // sum_v and the drop/reset sums stay DECIMAL so coarser
        // recompositions ([[overTime]], [[counterIncrease]]) re-reduce
        // without double rounding; presentation edges cast once. Layers hold
        // counter/gauge metrics where NaN does not occur (staleness markers
        // are filtered above) — a NaN sample fails loudly via decOrFail.
        sumOrFail(decOrFail(col("value"), Det.dec), "value").as("sum_v"),
        min(col("value")).as("min_v"),
        max(col("value")).as("max_v"),
        min_by(col("value"), ord).as("first_v"),
        min(col("ts_ms")).as("first_ts"),
        max_by(col("value"), ord).as("last_v"),
        max(col("ts_ms")).as("last_ts"),
        // second-to-last sample = the LAST row's lagged predecessor (null
        // for single-sample windows) — what irate/idelta recomposition needs
        max_by(col("__graft_prev"), ord).as("last2_v"),
        max_by(col("__graft_prev_ts"), ord).as("last2_ts"),
        sumOrFail(decOrFail(dropTerm, Det.dec), "drop").as("drop_sum"),
        sumOrFail(decOrFail(resetTerm, Det.dec), "reset").as("reset_sum"),
        sum(when(isDrop, 1L).otherwise(0L)).as("n_resets"),
        sum(when(col("__graft_prev").isNotNull &&
          !(col("value") <=> col("__graft_prev")), 1L).otherwise(0L)).as("n_changes"))
  }

  /** Everything a HISTOGRAM layer row carries besides its label columns. */
  val histLayerCols: Set[String] = Set("win_start", "n", "first_ts", "last_ts",
    "first_h", "last_h", "resets")

  /** Downsample layer for native-histogram series: per (series, left-open
    * aligned window) the window's first/last histogram samples with
    * timestamps, plus the ts-ORDERED LIST of pre-reset histograms over
    * in-window consecutive pairs ([[graft.promql.NativeHistograms
    * .resetList]]). Lists, not partial sums, because float addition does
    * not associate: replaying the concatenated per-window lists (plus
    * boundary resets recovered from first/last at read time) in ts order
    * reproduces the raw scan's float fold bit-for-bit — the histogram
    * analog of the float layer's decimal discipline. Resets are rare, so a
    * window row is ~2 histograms + a near-empty list: the ~window/cadence
    * read saving long-range `histogram_quantile(φ, rate(h[30d]))` needs at
    * 100 TB survives. Rows mixing float and histogram samples in one series
    * are out of scope: only `h`-carrying rows aggregate (staleness markers
    * are float rows and drop out with them). */
  def histLayer(samples: DataFrame, resMs: Long): DataFrame = {
    require(samples.columns.contains("h") &&
      graft.promql.Eval.isHistCol(samples, "h"),
      "histLayer needs a native-histogram struct column 'h'")
    val lbls = samples.columns.filterNot(bookkeeping + "h").toSeq
    val pts = samples.filter(col("h").isNotNull)
      .withColumn("win_start", winStartOf(col("ts_ms"), resMs))
    pts
      .groupBy((col("series_hash") +: col("win_start") +: lbls.map(col)): _*)
      .agg(count(lit(1)).as("n"),
        min(col("ts_ms")).as("first_ts"),
        max(col("ts_ms")).as("last_ts"),
        sort_array(collect_list(struct(col("ts_ms"), col("sample_id"),
          col("h")))).as("__graft_hpts"))
      .withColumn("first_h", element_at(col("__graft_hpts"), 1).getField("h"))
      .withColumn("last_h", element_at(col("__graft_hpts"), -1).getField("h"))
      .withColumn("resets",
        graft.promql.NativeHistograms.resetList(col("__graft_hpts")))
      .drop("__graft_hpts")
  }

  /** Fine→coarse HISTOGRAM layer recomposition (the 5m→1h compactor chain,
    * [[deriveCoarseDates]]' histogram analog): per (series, coarse window)
    * the fine windows collect win_start-sorted; first/last histograms come
    * from the edge windows and the pre-reset LIST is the replay of fine
    * lists with boundary resets interleaved at their true positions
    * ([[graft.promql.NativeHistograms.replayResets]]) — the identical
    * ts-ordered sequence a direct coarse [[histLayer]] build stores, so
    * derivation is bit-exact (EtlSpec pins the identity). */
  def histOverTime(fine: DataFrame, windowMs: Long, resMs: Long): DataFrame = {
    require(windowMs % resMs == 0L,
      s"coarse window $windowMs must be a multiple of the layer resolution $resMs")
    val hT = fine.schema("last_h").dataType
    val lbls = fine.columns.filterNot(bookkeeping ++ histLayerCols).toSeq
    fine
      .withColumn("__graft_cw", col("win_start") - pmod(col("win_start"), lit(windowMs)))
      .groupBy((col("series_hash") +: col("__graft_cw").as("win_start") +:
        lbls.map(col)): _*)
      .agg(sum(col("n")).as("n"),
        min(col("first_ts")).as("first_ts"),
        max(col("last_ts")).as("last_ts"),
        sort_array(collect_list(struct(col("win_start"),
          col("first_h").as("fh"), col("last_h").as("lh"),
          col("resets").as("rs")))).as("__graft_ws"))
      .withColumn("first_h", element_at(col("__graft_ws"), 1).getField("fh"))
      .withColumn("last_h", element_at(col("__graft_ws"), -1).getField("lh"))
      .withColumn("resets",
        graft.promql.NativeHistograms.replayResets(col("__graft_ws"), hT))
      .drop("__graft_ws")
  }

  /** [[refreshDates]] for HISTOGRAM layers: recompute only the given WINDOW
    * dates' rows of a date-partitioned `downsample-hist-<res>` layer from
    * the (already-merged) h-carrying sample store. Same midnight-fragment
    * discipline as the float refresh. */
  def histRefreshDates(spark: SparkSession, samples: DataFrame, layerDir: String,
                       resMs: Long, dates: Seq[String]): Unit = {
    if (dates.isEmpty) return
    require(86400000L % resMs == 0L,
      s"layer resolution $resMs must divide a day for per-date maintenance")
    val next = dates.map(nextDate).distinct
    val relevant = samples.filter(
      col("date").isin(dates: _*) ||
        (col("date").isin(next: _*) && pmod(col("ts_ms"), lit(86400000L)) === 0L))
      .drop("date")
    val part = histLayer(relevant, resMs)
      .withColumn("date", date_format(timestamp_millis(col("win_start")), "yyyy-MM-dd"))
      .filter(col("date").isin(dates: _*))
    part
      .repartitionByRange(col("date"), col("series_hash"), col("win_start"))
      .sortWithinPartitions(col("date"), col("series_hash"), col("win_start"))
      .write.mode("overwrite").partitionBy("date")
      .option("partitionOverwriteMode", "dynamic")
      .option("compression", "zstd")
      .parquet(layerDir)
    stampVersion(spark, layerDir)
  }

  /** [[deriveCoarseDates]] for HISTOGRAM layers: the coarse refresh reads
    * the fine layer instead of raw, bit-exact by the [[histOverTime]]
    * identity. */
  def histDeriveCoarseDates(spark: SparkSession, fineLayerDir: String,
                            coarseLayerDir: String, fineRes: Long,
                            coarseRes: Long, dates: Seq[String]): Unit = {
    if (dates.isEmpty) return
    require(coarseRes % fineRes == 0L,
      s"coarse resolution $coarseRes must be a multiple of fine $fineRes")
    require(86400000L % coarseRes == 0L,
      s"coarse resolution $coarseRes must divide a day for per-date maintenance")
    val fine = openLayer(spark, fineLayerDir)
      .filter(col("date").isin(dates: _*)).drop("date")
    val part = histOverTime(fine, coarseRes, fineRes)
      .withColumn("date", date_format(timestamp_millis(col("win_start")), "yyyy-MM-dd"))
    part
      .repartitionByRange(col("date"), col("series_hash"), col("win_start"))
      .sortWithinPartitions(col("date"), col("series_hash"), col("win_start"))
      .write.mode("overwrite").partitionBy("date")
      .option("partitionOverwriteMode", "dynamic")
      .option("compression", "zstd")
      .parquet(coarseLayerDir)
    stampVersion(spark, coarseLayerDir)
  }

  /** Discover persisted HISTOGRAM layers (`downsample-hist-<resMs>`
    * subtrees) — same version gate as [[discoverLayers]]. */
  def discoverHistLayers(spark: SparkSession, outDir: String): Map[Long, DataFrame] = {
    val root = java.nio.file.Paths.get(outDir)
    if (!java.nio.file.Files.isDirectory(root)) Map.empty
    else {
      val s = java.nio.file.Files.list(root)
      try {
        var acc = Map.empty[Long, DataFrame]
        val it = s.iterator()
        while (it.hasNext) {
          val p = it.next()
          val name = p.getFileName.toString
          if (java.nio.file.Files.isDirectory(p) &&
              name.startsWith("downsample-hist-")) {
            if (versionOf(p).contains(LayerFormatVersion))
              name.stripPrefix("downsample-hist-").toLongOption.foreach { res =>
                scala.util.Try(openLayer(spark, p.toString)).toOption
                  .foreach(acc += res -> _)
              }
            else warnStaleLayer(p)
          }
        }
        acc
      } finally s.close()
    }
  }

  /** Recompose the layer at a coarser aligned window whose width is a
    * multiple of the layer resolution — the read path for
    * `count/sum/min/max/first/last_over_time` and per-window increase on
    * long-range grids. Every aggregate (including the drop/reset accounting,
    * via boundary pairs between constituent windows) reduces exactly, so the
    * result is bit-identical to building the coarse layer from raw
    * (EtlSpec pins `overTime(layer(1h), 6h) == layer(6h)`). */
  def overTime(layer: DataFrame, windowMs: Long, resMs: Long): DataFrame = {
    require(windowMs % resMs == 0L,
      s"coarse window $windowMs must be a multiple of the layer resolution $resMs")
    val lbls = layer.columns.filterNot(bookkeeping ++ layerCols).toSeq
    val w = Window.partitionBy(col("series_hash"), col("__graft_cw"))
      .orderBy(col("win_start"))
    val isBoundaryDrop = col("__graft_prev_last").isNotNull &&
      col("first_v") < col("__graft_prev_last")
    val boundaryDrop = when(isBoundaryDrop,
      col("__graft_prev_last") - col("first_v")).otherwise(lit(0.0))
    val boundaryReset = when(isBoundaryDrop, col("__graft_prev_last")).otherwise(lit(0.0))
    layer
      .withColumn("__graft_cw", col("win_start") - pmod(col("win_start"), lit(windowMs)))
      .withColumn("__graft_prev_last", lag(col("last_v"), 1).over(w))
      .withColumn("__graft_prev_last_ts", lag(col("last_ts"), 1).over(w))
      .groupBy((col("series_hash") +: col("__graft_cw").as("win_start") +: lbls.map(col)): _*)
      .agg(
        sum(col("n")).as("n"),
        sumOrFail(col("sum_v"), "value").as("sum_v"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"),
        min_by(col("first_v"), col("first_ts")).as("first_v"),
        min(col("first_ts")).as("first_ts"),
        max_by(col("last_v"), col("last_ts")).as("last_v"),
        max(col("last_ts")).as("last_ts"),
        // coarse second-to-last: the last fine window's own pair when it has
        // ≥2 samples, else its predecessor's last (null when none in range)
        max_by(when(col("n") >= 2, col("last2_v")).otherwise(col("__graft_prev_last")),
          col("win_start")).as("last2_v"),
        max_by(when(col("n") >= 2, col("last2_ts")).otherwise(col("__graft_prev_last_ts")),
          col("win_start")).as("last2_ts"),
        sumOrFail(decOrFail(col("drop_sum"), decWide) + decOrFail(boundaryDrop, decTerm),
          "drop").cast(Det.dec).as("drop_sum"),
        sumOrFail(decOrFail(col("reset_sum"), decWide) + decOrFail(boundaryReset, decTerm),
          "reset").cast(Det.dec).as("reset_sum"),
        sum(col("n_resets") + when(isBoundaryDrop, 1L).otherwise(0L)).as("n_resets"),
        sum(col("n_changes") + when(col("__graft_prev_last").isNotNull &&
          !(col("first_v") <=> col("__graft_prev_last")), 1L).otherwise(0L))
          .as("n_changes"))
  }

  /** Reset-aware counter increase per series over the whole layer — the read
    * path a long-range `increase()`/`rate()` takes against a downsampled
    * layer. Boundary resets (window k's first below window k-1's last) are
    * the cross-window drop terms the per-window `drop_sum` cannot see; both
    * stay decimal until the single final cast, so the result equals the raw
    * scan exactly. */
  def counterIncrease(layer: DataFrame): DataFrame = {
    val lbls = layer.columns.filterNot(bookkeeping ++ layerCols).toSeq
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
        sumOrFail(decOrFail(col("drop_sum"), decWide) + col("__graft_boundary"),
          "drop").as("__graft_drops"))
      .select((lbls.map(col) :+
        ((col("__graft_last") - col("__graft_first")) +
          col("__graft_drops").cast("double")).as("inc")): _*)
  }

  /** Thanos' auto-downsampling rule (query/querier.go): read the coarsest
    * layer whose resolution still gives ≥5 windows per step. The engine's
    * layer routing ([[graft.promql.LayerRoute]]) additionally requires exact
    * window/grid alignment, under which "coarsest admissible" is the same
    * rule with exactness guaranteed. */
  def pick(stepMs: Long): Long =
    if (stepMs >= 5 * Res1h) Res1h
    else if (stepMs >= 5 * Res5m) Res5m
    else 0L

  /** Persist a layer next to the converted layout, range-sharded by series so
    * a matcher select touches few files (same discipline as Ingest's sorted
    * sharded write). */
  def writeLayer(layer: DataFrame, outDir: String): Unit = {
    // admission stats ride the write job itself (CollectMetrics on the
    // pre-shuffle subtree) — no separate aggregate pass over the layer
    val obs = org.apache.spark.sql.Observation()
    layer
      .observe(obs, sum(col("n")).as("sum_n"), count(lit(1)).as("rows"))
      .repartitionByRange(col("series_hash"), col("win_start"))
      .sortWithinPartitions(col("series_hash"), col("win_start"))
      .write.mode("overwrite").parquet(outDir)
    stampVersion(layer.sparkSession, outDir)
    val m = obs.get
    stampStats(layer.sparkSession, outDir,
      Option(m.getOrElse("sum_n", null)).map(_.asInstanceOf[Long]).getOrElse(0L),
      m.getOrElse("rows", 0L).asInstanceOf[Long])
  }

  def openLayer(spark: SparkSession, outDir: String): DataFrame = {
    val df = spark.read.parquet(outDir)
    // seed the admission cache from the sidecar: a stamped layer admits
    // with ZERO Spark jobs (LayerRouteSpec pins this); non-local URIs fall
    // through to the probe like any stat-less layer
    scala.util.Try(java.nio.file.Paths.get(outDir)).toOption
      .flatMap(statsOf).foreach { case (sumN, rows) =>
        graft.promql.LayerRoute.seedBenefit(df, sumN, rows)
      }
    df
  }

  /** Discover persisted layers under a layout dir (`downsample-<resMs>`
    * subtrees, as written by [[refreshDates]] / the streaming ingest) — the
    * serve-time wiring of Thanos auto-downsampling: hand the result to
    * `PromEngine(layers = …)` and aligned long-range queries read the
    * coarsest admissible layer transparently. */
  def discoverLayers(spark: SparkSession, outDir: String): Map[Long, DataFrame] = {
    val root = java.nio.file.Paths.get(outDir)
    if (!java.nio.file.Files.isDirectory(root)) Map.empty
    else {
      val s = java.nio.file.Files.list(root)
      try {
        var acc = Map.empty[Long, DataFrame]
        val it = s.iterator()
        while (it.hasNext) {
          val p = it.next()
          val name = p.getFileName.toString
          if (java.nio.file.Files.isDirectory(p) && name.startsWith("downsample-") &&
              !name.startsWith("downsample-hist-")) {
            if (versionOf(p).contains(LayerFormatVersion))
              name.stripPrefix("downsample-").toLongOption.foreach { res =>
                // a dir holding only the marker (e.g. the float family of an
                // all-histogram store) has no schema to open — skip, not error
                scala.util.Try(openLayer(spark, p.toString)).toOption
                  .foreach(acc += res -> _)
              }
            else warnStaleLayer(p)
          }
        }
        acc
      } finally s.close()
    }
  }

  /** Incrementally maintain a date-partitioned layer: recompute ONLY the
    * given dates' windows from the (already-merged) sample store and
    * dynamically overwrite those partitions. Both supported resolutions
    * divide a day; a window is keyed to the date of its `win_start`, so with
    * left-open windows the one cross-date instant — a sample at exactly
    * midnight of d+1, which belongs to day d's last window `(24h−res, 24h]`
    * — is read from the d+1 partition by an exact-midnight predicate (page
    * stats prune it to nearly nothing). Work per refresh ∝ touched dates ×
    * their series — the same property that keeps [[Ingest.mergeChunked]]
    * ingestible at 100 TB; re-running on a re-delivered batch is idempotent
    * (same inputs → same partitions).
    *
    * `dates` are WINDOW dates: callers deriving them from a batch must remap
    * a sample at exactly midnight(d) to window date d−1
    * ([[touchedWindowDates]]). */
  def refreshDates(spark: SparkSession, samples: DataFrame, layerDir: String,
                   resMs: Long, dates: Seq[String]): Unit = {
    if (dates.isEmpty) return
    require(86400000L % resMs == 0L,
      s"layer resolution $resMs must divide a day for per-date maintenance")
    val next = dates.map(nextDate).distinct
    val relevant = samples.filter(
      col("date").isin(dates: _*) ||
        (col("date").isin(next: _*) && pmod(col("ts_ms"), lit(86400000L)) === 0L))
      .drop("date")
    val part = layer(relevant, resMs)
      .withColumn("date", date_format(timestamp_millis(col("win_start")), "yyyy-MM-dd"))
      // next-day midnight samples also produce their OWN day's first window —
      // computed from just that fragment it would be wrong, and it is not a
      // partition this refresh was asked to rewrite
      .filter(col("date").isin(dates: _*))
    part
      .repartitionByRange(col("date"), col("series_hash"), col("win_start"))
      .sortWithinPartitions(col("date"), col("series_hash"), col("win_start"))
      .write.mode("overwrite").partitionBy("date")
      .option("partitionOverwriteMode", "dynamic")
      .option("compression", "zstd")
      .parquet(layerDir)
    stampVersion(spark, layerDir)
  }

  /** Derive a coarse layer's dates FROM a finer layer — the Thanos
    * compactor's 5m→1h chain (raw→5m→1h, compact/downsample.go): the coarse
    * refresh reads 1/(coarse/fine) as many rows as a raw recompute and
    * stays bit-identical by the [[overTime]] recomposition identity
    * (EtlSpec pins `overTime(layer(5m), 1h) == layer(1h)`). Fine windows of
    * a coarse window share its `win_start` date (both resolutions divide a
    * day), so per-date derivation needs no cross-date fragments at all. */
  def deriveCoarseDates(spark: SparkSession, fineLayerDir: String,
                        coarseLayerDir: String, fineRes: Long, coarseRes: Long,
                        dates: Seq[String]): Unit = {
    if (dates.isEmpty) return
    require(coarseRes % fineRes == 0L,
      s"coarse resolution $coarseRes must be a multiple of fine $fineRes")
    require(86400000L % coarseRes == 0L,
      s"coarse resolution $coarseRes must divide a day for per-date maintenance")
    val fine = openLayer(spark, fineLayerDir)
      .filter(col("date").isin(dates: _*)).drop("date")
    val part = overTime(fine, coarseRes, fineRes)
      .withColumn("date", date_format(timestamp_millis(col("win_start")), "yyyy-MM-dd"))
    part
      .repartitionByRange(col("date"), col("series_hash"), col("win_start"))
      .sortWithinPartitions(col("date"), col("series_hash"), col("win_start"))
      .write.mode("overwrite").partitionBy("date")
      .option("partitionOverwriteMode", "dynamic")
      .option("compression", "zstd")
      .parquet(coarseLayerDir)
    stampVersion(spark, coarseLayerDir)
  }

  /** WINDOW dates a batch of samples touches, for [[refreshDates]]: the date
    * of `ts−1` maps a sample at exactly midnight(d) to d−1 (whose last
    * left-open window it falls in) and every other sample to its own date —
    * resolution-independent for any resolution dividing a day. */
  def touchedWindowDates(batch: DataFrame): Seq[String] =
    batch.select(date_format(timestamp_millis(col("ts_ms") - 1), "yyyy-MM-dd")
        .as("d")).distinct()
      .collect().map(_.getString(0)).toSeq.sorted

  private[graft] def nextDate(d: String): String =
    java.time.LocalDate.parse(d).plusDays(1).toString
}
