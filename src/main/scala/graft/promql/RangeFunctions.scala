package graft.promql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Det
import graft.model.TimeSeriesModel

/** PromQL range functions (`rate`, `increase`, `delta`, `x_over_time`;
  * SURVEY.md §2.4 A7) over tumbling windows.
  *
  * The reference delegates these to promql-engine's per-step vector operators.
  * Spark-first re-expression: assign each sample to its tumbling window
  * `w = ts − ((ts − origin) mod windowMs)` and compute every range function as
  * one `groupBy(series, window)` hash aggregation — partial/final agg, single
  * shuffle, whole-stage codegen; no per-step re-scan.
  *
  * Counter-reset correction for `rate`/`increase` (Prometheus semantics: a
  * counter that drops is assumed to have reset to 0, so the pre-reset value is
  * added back) needs each sample's predecessor *within the same series*; we
  * compute it once with a `lag` window over (series ordered by ts) and only
  * count pairs whose two ends fall in the same tumbling window — identical to
  * evaluating resets over the window's own sample list.
  */
object RangeFunctions {

  private val labelCols = TimeSeriesModel.labelNames.map(col)
  private def winStart(origin: Long, windowMs: Long): Column =
    (col("ts_ms") - pmod(col("ts_ms") - origin, lit(windowMs))).as("win_ms")

  /** Generic `<agg>_over_time`: one aggregate expression per output column. */
  def overTime(samples: DataFrame, windowMs: Long, origin: Long = 0L)
              (aggs: (String, Column)*): DataFrame =
    samples
      .withColumn("win_ms", winStart(origin, windowMs))
      .groupBy(col("series_hash") +: col("win_ms") +: labelCols: _*)
      .agg(aggs.head._2.as(aggs.head._1),
           aggs.tail.map { case (n, c) => c.as(n) }: _*)

  def sumOverTime(c: Column): Column   = Det.dsum(c)
  def avgOverTime(c: Column): Column   = Det.davg(c)
  def minOverTime(c: Column): Column   = min(c)
  def maxOverTime(c: Column): Column   = max(c)
  def countOverTime(c: Column): Column = count(c)
  def stddevOverTime(c: Column): Column = Det.dstddevPop(c)
  def lastOverTime(value: Column, ts: Column): Column  = max_by(value, ts)
  def firstOverTime(value: Column, ts: Column): Column = min_by(value, ts)

  /** rate / increase / delta / idelta over tumbling windows — the SAME
    * Prometheus extrapolation semantics as the engine's grid path
    * (`Compiler.extrapolated`): each tumbling window `(win_ms, win_ms+W]`
    * is treated as a range evaluation at step `win_ms+W`, so `increase`
    * extends the in-sample slope to the window bounds with the
    * half-average-interval threshold and the counter zero-crossing clamp,
    * `rate` divides by the window, and `delta` is the gauge extrapolation
    * (no reset compensation, no zero clamp). A window with <2 samples
    * yields NULL for all three (Prometheus emits nothing), while
    * `n_samples` still reports the count.
    *
    * Output columns: labels + win_ms + `n_samples`, `delta`, `increase`,
    * `rate`, `idelta`.
    */
  def rateFamily(samples: DataFrame, windowMs: Long, origin: Long = 0L): DataFrame = {
    val w = Window.partitionBy(col("series_hash"))
      .orderBy(col("ts_ms"), col("sample_id"))
    val withPrev = samples
      .withColumn("prev_val", lag(col("value"), 1).over(w))
      .withColumn("prev_ts", lag(col("ts_ms"), 1).over(w))
      .withColumn("win_ms", winStart(origin, windowMs))
      .withColumn("same_win", col("prev_ts").isNotNull &&
        (col("prev_ts") - pmod(col("prev_ts") - origin, lit(windowMs))) === col("win_ms"))
    val resetTerm = when(col("same_win") && col("value") < col("prev_val"), col("prev_val"))
      .otherwise(lit(0.0))
    val g = withPrev
      .groupBy(col("series_hash") +: col("win_ms") +: labelCols: _*)
      .agg(
        count(col("value")).as("n_samples"),
        min(col("ts_ms")).as("first_ts"),
        max(col("ts_ms")).as("last_ts"),
        min_by(col("value"), col("ts_ms")).as("first_val"),
        max_by(col("value"), col("ts_ms")).as("last_val"),
        sum(resetTerm.cast(Det.dec)).cast("double").as("resets"),
        // last in-window instantaneous delta; NULL when the window's last
        // sample has no same-window predecessor (PromQL idelta needs ≥2)
        expr("max_by(value - prev_val, ts_ms) FILTER (WHERE same_win)").as("idelta"))
    // Prometheus extrapolatedRate over the tumbling frame: window start =
    // win_ms, window end = win_ms + W (clamp order as in Compiler
    // .extrapolated: boundary threshold first, zero-crossing second)
    val n = col("n_samples")
    val si = (col("last_ts") - col("first_ts")).cast("double") / lit(1000.0)
    val ds0 = (col("first_ts") - col("win_ms")).cast("double") / lit(1000.0)
    val de0 = (col("win_ms") + lit(windowMs) - col("last_ts")).cast("double") / lit(1000.0)
    val ai = si / (n - 1)
    val thr = ai * lit(1.1)
    val rvC = col("last_val") - col("first_val") + col("resets")
    val rvG = col("last_val") - col("first_val")
    val dz = si * (col("first_val") / rvC)
    val dsA = when(ds0 >= thr, ai / lit(2.0)).otherwise(ds0)
    val dsB = when(rvC > 0 && col("first_val") >= 0 && dz < dsA, dz).otherwise(dsA)
    val deB = when(de0 >= thr, ai / lit(2.0)).otherwise(de0)
    val incC = rvC * ((si + dsB + deB) / si)
    val incG = rvG * ((si + dsA + deB) / si)
    g.select(
      (labelCols :+ col("win_ms") :+ col("n_samples") :+
        when(n >= 2, incG).as("delta") :+
        when(n >= 2, incC).as("increase") :+
        when(n >= 2, incC / lit(windowMs / 1000.0)).as("rate") :+
        col("idelta")): _*)
  }
}
