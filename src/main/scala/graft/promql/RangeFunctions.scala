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

  /** rate / increase / delta / idelta over tumbling windows.
    *
    * Output columns: labels + win_ms + `delta`, `increase`, `rate`, `idelta`,
    * `n_samples`. `rate` = increase / (lastTs − firstTs) in seconds (needs ≥2
    * samples; the plain within-window slope, not Prometheus' boundary
    * extrapolation — documented deviation, deterministic and oracle-checkable).
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
    g.select(
      (labelCols :+ col("win_ms") :+ col("n_samples") :+
        (col("last_val") - col("first_val")).as("delta") :+
        (col("last_val") - col("first_val") + col("resets")).as("increase") :+
        when(col("n_samples") >= 2,
          (col("last_val") - col("first_val") + col("resets")) /
            ((col("last_ts") - col("first_ts")).cast("double") / lit(1000.0))).as("rate") :+
        col("idelta")): _*)
  }
}
