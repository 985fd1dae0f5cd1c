package graft.promql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Det
import graft.model.TimeSeriesModel

/** PromQL aggregation operators (SURVEY.md §2.4 A6):
  * `sum/avg/min/max/count/stddev/stdvar/topk/bottomk/quantile … by/without`.
  *
  * The reference gets these from promql-engine; here each is one hash
  * aggregation (`groupBy(groupingLabels)`) — Spark does partial/final agg and
  * map-side combine natively, which is exactly the 2-phase plan a distributed
  * PromQL engine would hand-build.
  *
  * `topk`/`bottomk` are per-group rank windows (no global sort — the window
  * shuffles by group key only). `quantile` is an *exact* interpolated
  * quantile computed with explicit window arithmetic (deterministic and
  * oracle-checkable, unlike percentile_approx).
  */
object Aggregations {

  /** `by(labels…)` grouping; `without(labels…)` = all labels minus the given. */
  def byCols(labels: Seq[String]): Seq[Column] = labels.map(col)
  def withoutCols(labels: Seq[String]): Seq[Column] =
    TimeSeriesModel.labelNames.filterNot(labels.contains).map(col)

  def aggregate(vector: DataFrame, grouping: Seq[Column])
               (aggs: (String, Column)*): DataFrame =
    vector.groupBy(grouping: _*)
      .agg(aggs.head._2.as(aggs.head._1), aggs.tail.map { case (n, c) => c.as(n) }: _*)

  def sumAgg(c: Column): Column    = Det.dsum(c)
  def avgAgg(c: Column): Column    = Det.davg(c)
  def minAgg(c: Column): Column    = min(c)
  def maxAgg(c: Column): Column    = max(c)
  def countAgg(c: Column): Column  = count(c)
  def stddevAgg(c: Column): Column = Det.dstddevPop(c) // PromQL stddev is population
  def stdvarAgg(c: Column): Column = Det.dvarPop(c)

  /** topk(k, v) by group: keep the k series with largest value per group.
    * Deterministic tie-break on the full series key. */
  def topk(vector: DataFrame, k: Int, grouping: Seq[Column],
           tieBreak: Seq[Column], desc: Boolean = true): DataFrame = {
    val ordering = (if (desc) col("value").desc else col("value").asc) +:
      tieBreak.map(_.asc)
    val w = Window.partitionBy(grouping: _*).orderBy(ordering: _*)
    vector.withColumn("rk", row_number().over(w)).filter(col("rk") <= k).drop("rk")
  }

  def bottomk(vector: DataFrame, k: Int, grouping: Seq[Column],
              tieBreak: Seq[Column]): DataFrame =
    topk(vector, k, grouping, tieBreak, desc = false)

  /** Exact linear-interpolation quantile (PromQL `quantile(φ, v)` semantics:
    * rank h = φ·(n−1), result = v⌊h⌋ + (h−⌊h⌋)·(v⌊h⌋₊₁ − v⌊h⌋)).
    * Window arithmetic only — no sketch, no approximation; the per-group sort
    * shuffles by group key and sorts within partitions. */
  def quantile(vector: DataFrame, phi: Double, grouping: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(grouping: _*).orderBy(col("value"))
    val ranked = vector
      .withColumn("rn", row_number().over(w) - 1)
      .withColumn("n", count(lit(1)).over(Window.partitionBy(grouping: _*)))
    val h = lit(phi) * (col("n") - 1)
    val lo = floor(h).cast("long")
    ranked
      .filter(col("rn") === lo || col("rn") === lo + 1)
      .groupBy(grouping: _*)
      .agg(
        min_by(col("value"), col("rn")).as("v_lo"),
        max_by(col("value"), col("rn")).as("v_hi"),
        first(h - floor(h)).as("frac"))
      .select((grouping :+
        (col("v_lo") + col("frac") * (col("v_hi") - col("v_lo"))).as("value")): _*)
  }
}
