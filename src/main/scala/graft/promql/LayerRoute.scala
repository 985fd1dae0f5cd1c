package graft.promql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.etl.Downsample

/** Auto-downsampling: serve eligible range functions from a pre-built
  * aggregate layer instead of raw samples — the Thanos querier's transparent
  * downsampled-block routing (thanos query/querier.go `maxResolutionMillis`,
  * which the reference consciously delegates to its embedding querier,
  * SURVEY.md §2.1), re-expressed as a compile-time plan substitution.
  *
  * Exactness, not approximation: layer windows are LEFT-OPEN `(w, w+res]`
  * ([[Downsample.winStartOf]]), the same convention as PromQL's range
  * selector `(t-range, t]` — so whenever the selector's window width and
  * every evaluated grid step are multiples of a layer's resolution, the
  * selector is partitioned by whole windows and every per-step aggregate
  * recomposes from per-window aggregates with the SAME term multiset the raw
  * scan accumulates (decimal where order matters). The routed plan is
  * bit-identical to the raw plan (LayerRouteSpec pins it per function;
  * `s5_downsample_routed` pins `increase` against the DuckDB raw-scan
  * oracle) while reading ~window/res fewer rows — ~1/240th at 15s cadence
  * from the 1h layer, the read-shrinks-with-scale property a 30-day
  * `rate()` needs at 100 TB.
  *
  * Unaligned queries (or non-recomposable functions: `irate`, quantiles,
  * smoothers, …) silently fall back to the raw scan — routing is a pure
  * optimization, never a semantics change.
  */
object LayerRoute {

  /** Range functions whose per-step value is recomposable exactly from the
    * layer's window aggregates (first/last with timestamps, decimal sums,
    * reset/change pair accounting, min/max, counts). */
  val routable: Set[String] = Set(
    "count_over_time", "sum_over_time", "avg_over_time", "min_over_time",
    "max_over_time", "first_over_time", "last_over_time", "present_over_time",
    "absent_over_time", "ts_of_last_over_time", "rate", "increase", "delta",
    "resets", "changes", "irate", "idelta")

  private val bookkeeping = Set("series_hash", "date") ++ Downsample.layerCols

  /** Columns a layer must carry to be admissible at all. A layer persisted
    * by an older build (missing the reset/change accounting this round's
    * recomposition reads) is DECLINED — the query falls back to the raw scan
    * — rather than erroring per-query. `last2_*` stay optional: only
    * irate/idelta need the in-window pair, and tryRoute gates those
    * separately. */
  val requiredCols: Set[String] = Set("win_start", "n", "sum_v", "min_v",
    "max_v", "first_v", "first_ts", "last_v", "last_ts", "reset_sum",
    "n_resets", "n_changes")

  /** Minimum samples-per-layer-row compression for a layer to be worth
    * reading INSTEAD of raw. A layer row is ~4× wider than a sample row and
    * the recomposition adds a per-series window sort, so a layer whose
    * windows hold ~1 sample each (resolution finer than the data cadence —
    * e.g. the 5m layer over 15m-scraped data) reads MORE than the raw scan
    * it replaces. Routing must be a pure optimization; below this floor the
    * layer is declined and raw serves. */
  val MinBenefit: Double = 2.0

  // seeded (sidecar-backed) and probed entries live in SEPARATE maps: the
  // size cap must never evict a seeded value — losing one silently regresses
  // a stamped layer to the full-scan probe the sidecar exists to avoid.
  // Seeded size is bounded by real opened layers; the probed cap only guards
  // against a pathological churn of throwaway layer frames pinning their
  // relations (and sessions) for the JVM lifetime.
  private val seededBenefit =
    new java.util.concurrent.ConcurrentHashMap[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, java.lang.Double]()
  private val benefitCache =
    new java.util.concurrent.ConcurrentHashMap[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, java.lang.Double]()
  private val BenefitCacheCap = 256

  /** Seed the admission cache from a persisted `_graft_layer_stats` sidecar
    * ([[graft.etl.Downsample.writeLayer]] stamps Σn/rows during the write
    * job): admission of a stamped layer runs ZERO Spark jobs. */
  def seedBenefit(layer: DataFrame, sumN: Long, rows: Long): Unit =
    seededBenefit.put(layer.queryExecution.analyzed,
      if (rows == 0L) 0.0 else sumN.toDouble / rows)

  /** Samples-per-row compression ratio of a layer: Σn / rows. Read from the
    * persisted sidecar when the layer was opened through
    * [[graft.etl.Downsample.openLayer]]; otherwise ONE tiny single-column
    * aggregate the first time a stat-less layer is considered, cached for
    * the session (the key is the analyzed plan, so re-opening the same path
    * hits). The probe runs OUTSIDE the map lock — a cluster job must never
    * hold a ConcurrentHashMap bin lock, which would serialize concurrent
    * first-touch queries hashing to the same bin. Empty layers report 0
    * (never admissible). */
  def benefit(layer: DataFrame): Double = {
    val key = layer.queryExecution.analyzed
    val seeded = seededBenefit.get(key)
    if (seeded != null) return seeded.doubleValue
    val cached = benefitCache.get(key)
    if (cached != null) return cached.doubleValue
    val r = layer.agg(sum(col("n")).as("s"), count(lit(1)).as("c")).head()
    val v: java.lang.Double =
      if (r.isNullAt(0) || r.getLong(1) == 0L) 0.0
      else r.getLong(0).toDouble / r.getLong(1)
    if (benefitCache.size > BenefitCacheCap) benefitCache.clear()
    val prev = benefitCache.putIfAbsent(key, v)
    if (prev != null) prev.doubleValue else v.doubleValue
  }

  /** Structural + cost admission for a single layer frame. */
  private[promql] def admissibleLayer(layer: DataFrame): Boolean =
    requiredCols.subsetOf(layer.columns.toSet) && benefit(layer) >= MinBenefit

  /** Coarsest admissible resolution for (grid, window): the window must
    * cover whole layer windows, every evaluated step must land on a
    * window boundary, the layer must carry this build's aggregate columns,
    * and it must actually beat the raw scan ([[MinBenefit]]). "Coarsest
    * admissible" is Thanos' auto-downsampling choice ([[Downsample.pick]])
    * with exactness (and now cost) as the admission rule. */
  def admissibleRes(ctx: Compiler.Ctx, windowMs: Long): Option[Long] =
    ctx.layers.toSeq.sortBy(-_._1).collectFirst { case (res, layer) if
      res > 0 && windowMs >= res && windowMs % res == 0 &&
        java.lang.Math.floorMod(ctx.startMs, res) == 0L &&
        (ctx.nSteps == 0L || ctx.stepMs % res == 0L) &&
        admissibleLayer(layer) => res }

  /** Hybrid admission for an UNALIGNED grid: no alignment demands at all —
    * each step serves its interior whole windows from the layer and reads
    * raw only the two partial boundary slices `(t−window, ⌈t−window⌉_res]`
    * and `(⌊t⌋_res, t]` (each < res wide). Admission is a read-cost
    * estimate: the raw side scans two ranges of ≈(gridSpan + res) each, the
    * layer side ≈ fullSpan/benefit raw-row equivalents; route only when
    * that sums to comfortably less than the raw scan's fullSpan
    * (= gridSpan + window). This is what makes a dashboard's
    * `rate(x[30d])` at "now" — misaligned start, 30s step — read ~2×gridSpan
    * of raw plus a 1h layer instead of 30 days of raw samples. */
  private def hybridAdmissibleRes(ctx: Compiler.Ctx, windowMs: Long): Option[Long] =
    ctx.layers.toSeq.sortBy(-_._1).collectFirst { case (res, layer) if
      res > 0 && windowMs >= 2 * res && admissibleLayer(layer) &&
        hybridCostOk(ctx, windowMs, res, benefit(layer)) => res }

  /** Read-cost estimate for the hybrid route (see [[hybridAdmissibleRes]]
    * doc): raw boundary ranges + layer rows in raw-row equivalents must be
    * comfortably below the full raw scan. */
  private def hybridCostOk(ctx: Compiler.Ctx, windowMs: Long, res: Long,
                           layerBenefit: Double): Boolean = {
    val fullSpan = (ctx.endMs - ctx.startMs) + windowMs
    val loL = ctx.startMs - windowMs
    val loR = ceilRes(ctx.endMs - windowMs, res)
    val hiL = math.max(floorRes(ctx.startMs, res), loL)
    val rawRead = if (loR >= hiL) fullSpan
                  else (loR - loL) + (ctx.endMs - hiL)
    rawRead + (fullSpan / layerBenefit).toLong <= fullSpan * 3 / 4
  }

  private def floorRes(t: Long, res: Long): Long = t - java.lang.Math.floorMod(t, res)
  private def ceilRes(t: Long, res: Long): Long = floorRes(t + res - 1, res)

  /** Attempt the layer route for `fn` over a range selector; None = not
    * routable (fall back to the raw scan). `ctx` is the already
    * offset-shifted / @-pinned evaluation context, so offsets and fixed
    * instants route whenever the SHIFTED grid stays aligned. An aligned
    * grid takes the pure-layer route (zero raw reads); any other grid falls
    * to the hybrid whole-window + boundary-slice recomposition when the
    * cost estimate says the layer wins, else to the raw scan. */
  def tryRoute(fn: String, sel: Ast.Selector, windowMs: Long,
               ctx: Compiler.Ctx): Option[DataFrame] = {
    // irate/idelta need the per-window last pair; a layer persisted
    // before those columns existed serves everything else but not them
    def pairOk(res: Long): Boolean = !Set("irate", "idelta")(fn) ||
      ctx.layers(res).columns.contains("last2_v")
    if (!routable(fn) || ctx.layers.isEmpty) None
    else {
      val ms = sel.name.map(n => MatchEq("__name__", n) +: sel.matchers)
        .getOrElse(sel.matchers)
      admissibleRes(ctx, windowMs).filter(pairOk)
        .map(res => gridAggFromLayer(ctx.layers(res), ms, windowMs, res, ctx))
        .orElse(hybridAdmissibleRes(ctx, windowMs).filter(pairOk)
          .map(res => hybridGridAgg(ctx.layers(res), ms, windowMs, res, ctx)))
    }
  }

  /** Time bound on the layer scan: the windows that can serve any step of
    * the grid, plus day-partition pruning when the layer is date-partitioned
    * (window dates derive from `win_start`, so the bound is exact). */
  private def winBound(layer: DataFrame, lo: Long, hi: Long): Column = {
    val base = col("win_start").between(lo, hi)
    if (!layer.columns.contains("date")) base
    else {
      val cap = 253402214400000L // 9999-01-01, same DATE-literal clamp as Eval
      def day(ms: Long) = java.time.Instant.ofEpochMilli(ms.max(0L).min(cap))
        .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
      base && col("date") >= day(lo) && col("date") <= day(hi)
    }
  }

  /** The layer-side equivalent of Compiler.gridAgg: one row per
    * (series, step) carrying the SAME `__graft_*` aggregate columns the raw
    * path produces, so the per-function value mapping downstream is shared.
    *
    * A window `(w, w+res]` serves step t iff `w+res ≤ t ≤ w+window` — its
    * samples are then wholly inside `(t-window, t]`. Cross-window pairs
    * (counter resets / changes straddling a boundary) are recovered from
    * each window's `first_v` against the per-series previous window's
    * `last_v`; the previous window participates in the pair only when it
    * too serves the step (`prev_win ≥ t−window`), mirroring the raw path's
    * `prev_ts > win_lo` guard. Bounded fan-out like the raw path: each
    * window explodes to ≤⌈window/step⌉+1 steps, one hash aggregation. */
  private def gridAggFromLayer(layer0: DataFrame, ms: Seq[LabelMatcher],
                               windowMs: Long, resMs: Long,
                               ctx: Compiler.Ctx): DataFrame = {
    val lo = ctx.startMs - windowMs // smallest win_start any step needs
    val hi = ctx.endMs - resMs      // largest
    val layer = layer0.filter(winBound(layer0, lo, hi) &&
      Matchers.compile(layer0, ms))
    val w = Window.partitionBy(col("series_hash")).orderBy(col("win_start"))
    val withPrev = layer
      .withColumn("__graft_prev_last", lag(col("last_v"), 1).over(w))
      .withColumn("__graft_prev_last_ts", lag(col("last_ts"), 1).over(w))
      .withColumn("__graft_prev_win", lag(col("win_start"), 1).over(w))
    def floorDiv(a: Column, b: Long) = ((a - pmod(a, lit(b))) / b).cast("long")
    val kMin = greatest(floorDiv(col("win_start") + (resMs - ctx.startMs) +
      ctx.stepMs - 1, ctx.stepMs), lit(0L))
    val kMax = least(floorDiv(col("win_start") + (windowMs - ctx.startMs),
      ctx.stepMs), lit(ctx.nSteps))
    val lbls = layer.columns
      .filterNot(c => bookkeeping(c) || c.startsWith("__graft_")).toSeq
    val bValid = col("__graft_prev_win").isNotNull &&
      col("__graft_prev_win") >= col("step_ms") - windowMs
    val bDrop = bValid && col("first_v") < col("__graft_prev_last")
    // decimal discipline identical to Downsample.overTime: wide + term
    // operand types keep the addition at (38,9) with no precision sacrifice
    def dec(c: Column) = Downsample.decOrFail(c, Downsample.decWide)
    def term(c: Column) = Downsample.decOrFail(c, Downsample.decTerm)
    val hasPair = layer.columns.contains("last2_v")
    val grouped = withPrev
      .withColumn("__graft_k", explode(when(kMax >= kMin,
        sequence(kMin, kMax, lit(1L))).otherwise(array().cast("array<long>"))))
      .withColumn("step_ms", lit(ctx.startMs) + col("__graft_k") * ctx.stepMs)
      .withColumn("__graft_bdrop", bDrop)
      .withColumn("__graft_breset",
        term(when(bDrop, col("__graft_prev_last")).otherwise(lit(0.0))))
      .withColumn("__graft_bchange", when(bValid &&
        !(col("first_v") <=> col("__graft_prev_last")), 1L).otherwise(0L))
      .groupBy((col("series_hash") +: col("step_ms") +: lbls.map(col)): _*)
      .agg(sum(col("n")).as("__graft_n_samples"), (Seq(
        min(col("first_ts")).as("__graft_first_ts"),
        max(col("last_ts")).as("__graft_last_ts"),
        // windows are disjoint in time, so first_ts/last_ts are distinct
        // across a step's windows — the tie-break never fires
        min_by(col("first_v"), col("first_ts")).as("__graft_first_val"),
        max_by(col("last_v"), col("last_ts")).as("__graft_last_val"),
        // same decimal term multiset as the raw Det.dsum / Det.davg route
        // (layers reject NaN/Inf loudly at build, so the IEEE overlay the
        // raw path adds is vacuous here)
        sum(col("sum_v")).cast("double").as("__graft_sum_val"),
        (sum(col("sum_v")).cast("double") / sum(col("n"))).as("__graft_avg_val"),
        min(col("min_v")).as("__graft_min_val"),
        max(col("max_v")).as("__graft_max_val"),
        sum(dec(col("reset_sum")) + col("__graft_breset"))
          .cast("double").as("__graft_resets"),
        sum(col("n_resets") + when(col("__graft_bdrop"), 1L).otherwise(0L))
          .as("__graft_n_resets"),
        sum(col("n_changes") + col("__graft_bchange")).as("__graft_n_changes")) ++
        (if (hasPair) Seq(pairAgg(col("__graft_prev_win").isNotNull &&
          col("__graft_prev_win") >= col("step_ms") - windowMs,
          col("win_start"))) else Nil)): _*)
      .drop("series_hash")
    if (hasPair) withPairCols(grouped) else grouped
  }

  /** The step's final sample pair for irate/idelta: inside the last window
    * when it holds ≥2 samples (its stored `last2`), straddling into the
    * (validity-checked) previous window otherwise. Only aggregated when the
    * layer carries the pair columns. `pvalid` = the previous segment
    * participates in the straddle (aligned route: the previous window also
    * serves the step; hybrid route: a previous segment exists at all —
    * segments tile the selector range exactly, so existence is validity). */
  private def pairAgg(pvalid: Column, ordCol: Column): Column =
    max_by(struct(col("n").as("n"), col("last2_v").as("l2v"),
      col("last2_ts").as("l2t"), col("__graft_prev_last").as("pl"),
      col("__graft_prev_last_ts").as("plt"), pvalid.as("pvalid")),
      ordCol).as("__graft_lw")

  /** Hybrid whole-window + boundary-slice recomposition for an ARBITRARY
    * (start, step, window) grid — what the Thanos querier's transparent
    * downsampled-block serving does for any grid (the reference delegates
    * it, `cmd/serve.go:201-222`), kept BIT-exact here.
    *
    * Per step t the selector `(t−W, t]` is partitioned into time-disjoint
    * SEGMENTS that tile it exactly:
    *
    *   lo raw slice `(t−W, ⌈t−W⌉_res]` ++ interior whole layer windows
    *   ++ hi raw slice `(⌊t⌋_res, t]`
    *
    * (W ≥ 2·res guarantees at least one aligned boundary inside, so the
    * slices never overlap and each is < res wide). Interior windows come
    * from the layer with the SAME serve condition as the aligned route
    * (`w+res ≤ t ≤ w+W` — the derivation needs no alignment); the slices
    * come from a raw scan pruned to just two ranges
    * `(start−W, ⌈end−W⌉_res]` and `(⌊start⌋_res, end]` (pushed to parquet).
    * Every sample of the selector lands in exactly one segment, so a lag
    * over segments per (series, step) recovers every cross-segment
    * consecutive-sample pair — the previous non-empty segment's last sample
    * IS the immediately preceding sample — and the merged per-step
    * aggregates carry the same term multiset as the raw scan (decimal where
    * order matters), hence bit-identical results (LayerRouteSpec unaligned
    * fuzz + the `s5_downsample_unaligned` oracle). */
  private def hybridGridAgg(layer0: DataFrame, ms: Seq[LabelMatcher],
                            windowMs: Long, resMs: Long,
                            ctx: Compiler.Ctx): DataFrame = {
    import graft.functions.Det
    val hasPair = layer0.columns.contains("last2_v")
    def floorDiv(a: Column, b: Long) = ((a - pmod(a, lit(b))) / b).cast("long")
    def cFloor(t: Column) = t - pmod(t, lit(resMs))
    def cCeil(t: Column) = cFloor(t + (resMs - 1))
    def dec(c: Column) = Downsample.decOrFail(c, Downsample.decWide)
    def term(c: Column) = Downsample.decOrFail(c, Downsample.decTerm)
    val segCols = Seq("n", "sum_v", "min_v", "max_v", "first_v", "first_ts",
      "last_v", "last_ts", "reset_sum", "n_resets", "n_changes") ++
      (if (hasPair) Seq("last2_v", "last2_ts") else Nil)

    // ---- layer side: interior whole windows, exploded to the steps they
    // serve (w+res ≤ t ≤ w+W ⇔ the window lies wholly inside (t−W, t])
    val layer = layer0.filter(winBound(layer0, ctx.startMs - windowMs,
      ctx.endMs - resMs) && Matchers.compile(layer0, ms))
    val lbls = layer.columns
      .filterNot(c => bookkeeping(c) || c.startsWith("__graft_")).toSeq
    val kMinW = greatest(floorDiv(col("win_start") + (resMs - ctx.startMs) +
      ctx.stepMs - 1, ctx.stepMs), lit(0L))
    val kMaxW = least(floorDiv(col("win_start") + (windowMs - ctx.startMs),
      ctx.stepMs), lit(ctx.nSteps))
    val layerSeg = layer
      .withColumn("__graft_k", explode(when(kMaxW >= kMinW,
        sequence(kMinW, kMaxW, lit(1L))).otherwise(array().cast("array<long>"))))
      .withColumn("seg_start", col("win_start"))
      .select((Seq(col("series_hash"), col("__graft_k"), col("seg_start")) ++
        lbls.map(col) ++ segCols.map(col)): _*)

    // ---- raw side: ONLY the two boundary ranges are scanned (pushed to the
    // parquet reader); per-step slice membership is decided after explode
    val s = ctx.samples
    val loHi = math.min(ceilRes(ctx.endMs - windowMs, resMs), ctx.endMs)
    val hiLo = floorRes(ctx.startMs, resMs)
    val pts = s.filter(
      (Eval.timeBound(s, ctx.startMs - windowMs + 1, loHi) ||
        Eval.timeBound(s, hiLo + 1, ctx.endMs)) &&
        Matchers.compile(s, ms) && !graft.functions.IsStale(col("value")))
    val kMinP = greatest(floorDiv(col("ts_ms") - ctx.startMs + ctx.stepMs - 1,
      ctx.stepMs), lit(0L))
    val kMaxP = least(floorDiv(col("ts_ms") - ctx.startMs + windowMs - 1,
      ctx.stepMs), lit(ctx.nSteps))
    val stepOf = lit(ctx.startMs) + col("__graft_k") * ctx.stepMs
    val exploded = pts
      .withColumn("__graft_k", explode(when(kMaxP >= kMinP,
        sequence(kMinP, kMaxP, lit(1L))).otherwise(array().cast("array<long>"))))
      .withColumn("seg_start",
        when(col("ts_ms") > cFloor(stepOf), cFloor(stepOf))
          .when(col("ts_ms") <= cCeil(stepOf - windowMs), stepOf - windowMs))
      .filter(col("seg_start").isNotNull) // interior samples: layer serves them
    val ws = Window.partitionBy(col("series_hash"), col("__graft_k"),
      col("seg_start")).orderBy(col("ts_ms"), col("sample_id"))
    val ord = struct(col("ts_ms"), col("sample_id"))
    val withPrev = exploded
      .withColumn("__graft_prev", lag(col("value"), 1).over(ws))
      .withColumn("__graft_prev_ts", lag(col("ts_ms"), 1).over(ws))
    val isDrop = col("__graft_prev").isNotNull &&
      !isnan(col("__graft_prev")) && col("value") < col("__graft_prev")
    // mirror Downsample.layer's per-window aggregation at slice grain, same
    // decimal discipline, so slice segments are indistinguishable from
    // layer segments downstream
    val rawSeg = withPrev
      .groupBy((Seq(col("series_hash"), col("__graft_k"), col("seg_start")) ++
        lbls.map(col)): _*)
      .agg(count(lit(1)).as("n"), (Seq(
        sum(Downsample.decOrFail(col("value"), Det.dec)).cast(Det.dec).as("sum_v"),
        min(col("value")).as("min_v"),
        max(col("value")).as("max_v"),
        min_by(col("value"), ord).as("first_v"),
        min(col("ts_ms")).as("first_ts"),
        max_by(col("value"), ord).as("last_v"),
        max(col("ts_ms")).as("last_ts"),
        sum(Downsample.decOrFail(when(isDrop, col("__graft_prev"))
          .otherwise(lit(0.0)), Det.dec)).cast(Det.dec).as("reset_sum"),
        sum(when(isDrop, 1L).otherwise(0L)).as("n_resets"),
        sum(when(col("__graft_prev").isNotNull &&
          !(col("value") <=> col("__graft_prev")), 1L).otherwise(0L))
          .as("n_changes")) ++
        (if (hasPair) Seq(max_by(col("__graft_prev"), ord).as("last2_v"),
          max_by(col("__graft_prev_ts"), ord).as("last2_ts")) else Nil)): _*)

    // ---- merge: segments tile (t−W, t] exactly, ordered by seg_start; the
    // lag recovers every cross-segment consecutive pair (the previous
    // non-empty segment's last sample is the immediately preceding sample)
    val segs = layerSeg.unionByName(rawSeg
      .select((Seq(col("series_hash"), col("__graft_k"), col("seg_start")) ++
        lbls.map(col) ++ segCols.map(col)): _*))
    val wseg = Window.partitionBy(col("series_hash"), col("__graft_k"))
      .orderBy(col("seg_start"))
    val withPrevSeg = segs
      .withColumn("__graft_prev_last", lag(col("last_v"), 1).over(wseg))
      .withColumn("__graft_prev_last_ts", lag(col("last_ts"), 1).over(wseg))
    val bValid = col("__graft_prev_last").isNotNull
    val bDrop = bValid && col("first_v") < col("__graft_prev_last")
    val grouped = withPrevSeg
      .withColumn("step_ms", lit(ctx.startMs) + col("__graft_k") * ctx.stepMs)
      .withColumn("__graft_bdrop", bDrop)
      .withColumn("__graft_breset",
        term(when(bDrop, col("__graft_prev_last")).otherwise(lit(0.0))))
      .withColumn("__graft_bchange", when(bValid &&
        !(col("first_v") <=> col("__graft_prev_last")), 1L).otherwise(0L))
      .groupBy((col("series_hash") +: col("step_ms") +: lbls.map(col)): _*)
      .agg(sum(col("n")).as("__graft_n_samples"), (Seq(
        min(col("first_ts")).as("__graft_first_ts"),
        max(col("last_ts")).as("__graft_last_ts"),
        min_by(col("first_v"), col("first_ts")).as("__graft_first_val"),
        max_by(col("last_v"), col("last_ts")).as("__graft_last_val"),
        sum(col("sum_v")).cast("double").as("__graft_sum_val"),
        (sum(col("sum_v")).cast("double") / sum(col("n"))).as("__graft_avg_val"),
        min(col("min_v")).as("__graft_min_val"),
        max(col("max_v")).as("__graft_max_val"),
        sum(dec(col("reset_sum")) + col("__graft_breset"))
          .cast("double").as("__graft_resets"),
        sum(col("n_resets") + when(col("__graft_bdrop"), 1L).otherwise(0L))
          .as("__graft_n_resets"),
        sum(col("n_changes") + col("__graft_bchange")).as("__graft_n_changes")) ++
        (if (hasPair) Seq(pairAgg(col("__graft_prev_last_ts").isNotNull,
          col("seg_start"))) else Nil)): _*)
      .drop("series_hash")
    if (hasPair) withPairCols(grouped) else grouped
  }

  /** Required columns of a histogram layer frame. */
  val histRequiredCols: Set[String] = Set("win_start", "n", "first_ts",
    "last_ts", "first_h", "last_h", "resets")

  /** Aligned-grid admission for HISTOGRAM layers: same exactness + cost
    * rules as [[admissibleRes]] over `ctx.histLayers`. */
  def histAdmissibleRes(ctx: Compiler.Ctx, windowMs: Long): Option[Long] =
    ctx.histLayers.toSeq.sortBy(-_._1).collectFirst { case (res, layer) if
      res > 0 && windowMs >= res && windowMs % res == 0 &&
        java.lang.Math.floorMod(ctx.startMs, res) == 0L &&
        (ctx.nSteps == 0L || ctx.stepMs % res == 0L) &&
        histRequiredCols.subsetOf(layer.columns.toSet) &&
        benefit(layer) >= MinBenefit => res }

  /** [[hybridAdmissibleRes]] for histogram layers. */
  private def hybridHistAdmissibleRes(ctx: Compiler.Ctx, windowMs: Long): Option[Long] =
    ctx.histLayers.toSeq.sortBy(-_._1).collectFirst { case (res, layer) if
      res > 0 && windowMs >= 2 * res &&
        histRequiredCols.subsetOf(layer.columns.toSet) &&
        benefit(layer) >= MinBenefit &&
        hybridCostOk(ctx, windowMs, res, benefit(layer)) => res }

  /** Layer route for `rate`/`increase`/`delta` over HISTOGRAM-typed range
    * selectors ([[Compiler]]'s histRange hook): returns the per-step frame
    * with `__graft_n`/`__graft_first_ts`/`__graft_last_ts`/`__graft_delta`
    * — the same columns the raw path feeds the shared extrapolation — or
    * None for the raw fallback. Aligned grids read the layer alone;
    * unaligned grids take the hybrid whole-window + boundary-slice route
    * when the cost estimate says the layer wins. `ctx` is already
    * offset-shifted/@-pinned. */
  def tryRouteHist(fn: String, sel: Ast.Selector, windowMs: Long,
                   ctx: Compiler.Ctx): Option[DataFrame] =
    if (ctx.histLayers.isEmpty || !Set("rate", "increase", "delta")(fn)) None
    else {
      val ms = sel.name.map(n => MatchEq("__name__", n) +: sel.matchers)
        .getOrElse(sel.matchers)
      val isCounter = fn != "delta"
      histAdmissibleRes(ctx, windowMs)
        .map(res => histGridAgg(ctx.histLayers(res), ms, windowMs, res, ctx,
          isCounter))
        .orElse(hybridHistAdmissibleRes(ctx, windowMs)
          .map(res => hybridHistGridAgg(ctx.histLayers(res), ms, windowMs,
            res, ctx, isCounter)))
    }

  /** Per-step recomposition from the histogram layer: windows explode to
    * the steps they serve exactly like [[gridAggFromLayer]]; per step the
    * window summaries are collected win_start-sorted and the raw scan's
    * reset fold is REPLAYED in ts order — per-window pre-reset lists
    * concatenated with boundary resets (prev window's last vs this
    * window's first) interleaved at their true positions — so the float
    * additions happen in the same order as the raw walk and the delta is
    * bit-identical ([[NativeHistograms.deltaFrom]] doc). Windows per step
    * ≤ window/res, so the collected list stays small. */
  private def histLbls(layer: DataFrame): Seq[String] =
    layer.columns.filterNot(c =>
      Set("series_hash", "date")(c) || Downsample.histLayerCols(c) ||
        c.startsWith("__graft_")).toSeq

  /** Interior whole-window segments of a histogram layer, exploded to the
    * steps they serve (same serve condition as the float routes), in the
    * shared segment shape (seg_start, n, first_ts, last_ts, fh, lh, rs). */
  private def histLayerSegments(layer0: DataFrame, ms: Seq[LabelMatcher],
                                windowMs: Long, resMs: Long,
                                ctx: Compiler.Ctx): DataFrame = {
    val layer = layer0.filter(winBound(layer0, ctx.startMs - windowMs,
      ctx.endMs - resMs) && Matchers.compile(layer0, ms))
    val lbls = histLbls(layer0)
    def floorDiv(a: Column, b: Long) = ((a - pmod(a, lit(b))) / b).cast("long")
    val kMin = greatest(floorDiv(col("win_start") + (resMs - ctx.startMs) +
      ctx.stepMs - 1, ctx.stepMs), lit(0L))
    val kMax = least(floorDiv(col("win_start") + (windowMs - ctx.startMs),
      ctx.stepMs), lit(ctx.nSteps))
    layer
      .withColumn("__graft_k", explode(when(kMax >= kMin,
        sequence(kMin, kMax, lit(1L))).otherwise(array().cast("array<long>"))))
      .withColumn("step_ms", lit(ctx.startMs) + col("__graft_k") * ctx.stepMs)
      .select((Seq(col("series_hash"), col("step_ms"),
        col("win_start").as("seg_start"), col("n"), col("first_ts"),
        col("last_ts"), col("first_h").as("fh"), col("last_h").as("lh"),
        col("resets").as("rs")) ++ lbls.map(col)): _*)
  }

  /** Shared tail of both histogram routes: merge the per-step segments
    * (disjoint, tiling the selector) into the `__graft_*` columns the
    * extrapolation consumes, replaying the reset lists in ts order. */
  private def histSegmentsToDelta(segs: DataFrame, lbls: Seq[String],
                                  hT: org.apache.spark.sql.types.DataType,
                                  isCounter: Boolean): DataFrame = {
    val grouped = segs
      .groupBy((col("series_hash") +: col("step_ms") +: lbls.map(col)): _*)
      .agg(sum(col("n")).as("__graft_n"),
        min(col("first_ts")).as("__graft_first_ts"),
        max(col("last_ts")).as("__graft_last_ts"),
        sort_array(collect_list(struct(col("seg_start"),
          col("fh"), col("lh"), col("rs")))).as("__graft_ws"))
      .filter(col("__graft_n") >= 2)
    val first = element_at(col("__graft_ws"), 1).getField("fh")
    val last = element_at(col("__graft_ws"), -1).getField("lh")
    val rp =
      if (!isCounter) array().cast(org.apache.spark.sql.types.ArrayType(hT))
      else NativeHistograms.replayResets(col("__graft_ws"), hT)
    NativeHistograms.stageDelta(grouped, first, last, rp, "__graft_delta")
      .drop("__graft_ws")
  }

  private def histGridAgg(layer0: DataFrame, ms: Seq[LabelMatcher],
                          windowMs: Long, resMs: Long, ctx: Compiler.Ctx,
                          isCounter: Boolean): DataFrame =
    histSegmentsToDelta(
      histLayerSegments(layer0, ms, windowMs, resMs, ctx),
      histLbls(layer0), layer0.schema("last_h").dataType, isCounter)

  /** Hybrid whole-window + boundary-slice route for HISTOGRAM layers on an
    * arbitrary grid — the same segment partition as [[hybridGridAgg]]
    * (interior windows from the layer, the two partial slices from a raw
    * scan pruned to two ranges), with the per-slice sample lists collected
    * and summarized into the shared segment shape. The merged reset replay
    * walks segments in ts order, so the float fold happens in the raw
    * scan's order and results stay bit-identical (HistLayerRouteSpec
    * unaligned fuzz). */
  private def hybridHistGridAgg(layer0: DataFrame, ms: Seq[LabelMatcher],
                                windowMs: Long, resMs: Long,
                                ctx: Compiler.Ctx, isCounter: Boolean): DataFrame = {
    val hT = layer0.schema("last_h").dataType
    val lbls = histLbls(layer0)
    val layerSeg = histLayerSegments(layer0, ms, windowMs, resMs, ctx)

    def cFloor(t: Column) = t - pmod(t, lit(resMs))
    def cCeil(t: Column) = cFloor(t + (resMs - 1))
    def floorDiv(a: Column, b: Long) = ((a - pmod(a, lit(b))) / b).cast("long")
    val s = ctx.samples
    val loHi = math.min(ceilRes(ctx.endMs - windowMs, resMs), ctx.endMs)
    val hiLo = floorRes(ctx.startMs, resMs)
    val pts = s.filter(
      (Eval.timeBound(s, ctx.startMs - windowMs + 1, loHi) ||
        Eval.timeBound(s, hiLo + 1, ctx.endMs)) &&
        Matchers.compile(s, ms) && !graft.functions.IsStale(col("value")))
    val kMinP = greatest(floorDiv(col("ts_ms") - ctx.startMs + ctx.stepMs - 1,
      ctx.stepMs), lit(0L))
    val kMaxP = least(floorDiv(col("ts_ms") - ctx.startMs + windowMs - 1,
      ctx.stepMs), lit(ctx.nSteps))
    val stepOf = lit(ctx.startMs) + col("__graft_k") * ctx.stepMs
    val rawSeg = pts
      .withColumn("__graft_k", explode(when(kMaxP >= kMinP,
        sequence(kMinP, kMaxP, lit(1L))).otherwise(array().cast("array<long>"))))
      .withColumn("step_ms", stepOf)
      .withColumn("seg_start",
        when(col("ts_ms") > cFloor(col("step_ms")), cFloor(col("step_ms")))
          .when(col("ts_ms") <= cCeil(col("step_ms") - windowMs),
            col("step_ms") - windowMs))
      .filter(col("seg_start").isNotNull)
      .groupBy((Seq(col("series_hash"), col("step_ms"), col("seg_start")) ++
        lbls.map(col)): _*)
      .agg(count(lit(1)).as("n"),
        min(col("ts_ms")).as("first_ts"),
        max(col("ts_ms")).as("last_ts"),
        sort_array(collect_list(struct(col("ts_ms"), col("sample_id"),
          col("h")))).as("__graft_srt"))
      .withColumn("fh", element_at(col("__graft_srt"), 1).getField("h"))
      .withColumn("lh", element_at(col("__graft_srt"), -1).getField("h"))
      .withColumn("rs",
        if (isCounter) NativeHistograms.resetList(col("__graft_srt"))
        else array().cast(org.apache.spark.sql.types.ArrayType(hT)))
      .drop("__graft_srt")
      .select((Seq(col("series_hash"), col("step_ms"), col("seg_start"),
        col("n"), col("first_ts"), col("last_ts"), col("fh"), col("lh"),
        col("rs")) ++ lbls.map(col)): _*)
    histSegmentsToDelta(layerSeg.unionByName(rawSeg), lbls, hT, isCounter)
  }

  private def withPairCols(g: DataFrame): DataFrame = {
    val pv = when(col("__graft_lw.n") >= 2, col("__graft_lw.l2v"))
      .otherwise(when(col("__graft_lw.pvalid"), col("__graft_lw.pl")))
    val pt = when(col("__graft_lw.n") >= 2, col("__graft_lw.l2t"))
      .otherwise(when(col("__graft_lw.pvalid"), col("__graft_lw.plt")))
    g.withColumn("__graft_pair_v", pv)
      .withColumn("__graft_pair_ts", pt)
      .withColumn("__graft_irate_dv", when(col("__graft_pair_v").isNotNull,
        when(col("__graft_last_val") < col("__graft_pair_v"), col("__graft_last_val"))
          .otherwise(col("__graft_last_val") - col("__graft_pair_v"))))
      .withColumn("__graft_irate_dt", when(col("__graft_pair_v").isNotNull,
        col("__graft_last_ts") - col("__graft_pair_ts")))
      .withColumn("__graft_idelta_val", when(col("__graft_pair_v").isNotNull,
        col("__graft_last_val") - col("__graft_pair_v")))
      .drop("__graft_lw", "__graft_pair_v", "__graft_pair_ts")
  }
}
