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

  /** Coarsest admissible resolution for (grid, window): the window must
    * cover whole layer windows and every evaluated step must land on a
    * window boundary. "Coarsest admissible" is Thanos' auto-downsampling
    * choice ([[Downsample.pick]]) with exactness as the admission rule. */
  def admissibleRes(ctx: Compiler.Ctx, windowMs: Long): Option[Long] =
    ctx.layers.keys.toSeq.sortBy(-_).find { res =>
      res > 0 && windowMs >= res && windowMs % res == 0 &&
        java.lang.Math.floorMod(ctx.startMs, res) == 0L &&
        (ctx.nSteps == 0L || ctx.stepMs % res == 0L)
    }

  /** Attempt the layer route for `fn` over a range selector; None = not
    * routable (fall back to the raw scan). `ctx` is the already
    * offset-shifted / @-pinned evaluation context, so offsets and fixed
    * instants route whenever the SHIFTED grid stays aligned. */
  def tryRoute(fn: String, sel: Ast.Selector, windowMs: Long,
               ctx: Compiler.Ctx): Option[DataFrame] =
    if (!routable(fn) || ctx.layers.isEmpty) None
    else admissibleRes(ctx, windowMs)
      // irate/idelta need the per-window last pair; a layer persisted
      // before those columns existed serves everything else but not them
      .filter(res => !Set("irate", "idelta")(fn) ||
        ctx.layers(res).columns.contains("last2_v"))
      .map { res =>
        val ms = sel.name.map(n => MatchEq("__name__", n) +: sel.matchers)
          .getOrElse(sel.matchers)
        gridAggFromLayer(ctx.layers(res), ms, windowMs, res, ctx)
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
        (if (hasPair) Seq(pairAgg(windowMs)) else Nil)): _*)
      .drop("series_hash")
    if (hasPair) withPairCols(grouped) else grouped
  }

  /** The step's final sample pair for irate/idelta: inside the last window
    * when it holds ≥2 samples (its stored `last2`), straddling into the
    * (validity-checked) previous window otherwise. Only aggregated when the
    * layer carries the pair columns. */
  private def pairAgg(windowMs: Long): Column =
    max_by(struct(col("n").as("n"), col("last2_v").as("l2v"),
      col("last2_ts").as("l2t"), col("__graft_prev_last").as("pl"),
      col("__graft_prev_last_ts").as("plt"),
      (col("__graft_prev_win").isNotNull &&
        col("__graft_prev_win") >= col("step_ms") - windowMs).as("pvalid")),
      col("win_start")).as("__graft_lw")

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
