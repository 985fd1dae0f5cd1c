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

  private val Salts = 32L

  /** Per-group exact limit-k under an arbitrary total order, with a salted
    * partial stage: rows are first cut to k per (group, salt) — `Salts`
    * parallel window partitions — so the final exact window sees ≤ Salts·k
    * rows per group instead of every series. This is the distributed analog
    * of TakeOrderedAndProject's per-partition limit: a global `topk(5)` with
    * no grouping would otherwise sort 10⁸ series in ONE window partition.
    * `ordering` must be a total order (tie-broken) for exactness; `saltOn`
    * must determine the row (any deterministic key columns). */
  /** `k` may be a literal or a PER-GROUP column (data-dependent parameters,
    * e.g. `topk(scalar(q), v)` — functionally dependent on `grouping`, which
    * the per-step scalar join guarantees). */
  def limitByOrdering(vector: DataFrame, k: Column, grouping: Seq[Column],
                      ordering: Seq[Column], saltOn: Seq[Column]): DataFrame = {
    val salted = vector.withColumn("__graft_salt",
      pmod(xxhash64((lit(0L) +: saltOn): _*), lit(Salts)))
    val w1 = Window.partitionBy((grouping :+ col("__graft_salt")): _*)
      .orderBy(ordering: _*)
    val pre = salted.withColumn("__graft_prk", row_number().over(w1))
      .filter(col("__graft_prk") <= k).drop("__graft_salt", "__graft_prk")
    val w = Window.partitionBy(grouping: _*).orderBy(ordering: _*)
    pre.withColumn("__graft_rk", row_number().over(w))
      .filter(col("__graft_rk") <= k).drop("__graft_rk")
  }

  def limitByOrdering(vector: DataFrame, k: Int, grouping: Seq[Column],
                      ordering: Seq[Column], saltOn: Seq[Column]): DataFrame =
    limitByOrdering(vector, lit(k), grouping, ordering, saltOn)

  /** topk(k, v) by group: keep the k series with largest value per group.
    * Deterministic tie-break on the full series key. */
  def topk(vector: DataFrame, k: Column, grouping: Seq[Column],
           tieBreak: Seq[Column], desc: Boolean): DataFrame = {
    // Prometheus ranks NaN below every real value for topk AND bottomk
    // (a NaN series only fills leftover slots); Spark's ordering puts NaN
    // greatest, so rank on an explicit isnan key first
    val ordering = isnan(col("value")).asc +:
      (if (desc) col("value").desc else col("value").asc) +:
      tieBreak.map(_.asc)
    limitByOrdering(vector, k, grouping, ordering, tieBreak :+ col("value"))
  }

  def topk(vector: DataFrame, k: Int, grouping: Seq[Column],
           tieBreak: Seq[Column], desc: Boolean = true): DataFrame =
    topk(vector, lit(k), grouping, tieBreak, desc)

  def bottomk(vector: DataFrame, k: Int, grouping: Seq[Column],
              tieBreak: Seq[Column]): DataFrame =
    topk(vector, k, grouping, tieBreak, desc = false)

  /** Exact linear-interpolation quantile (PromQL `quantile(φ, v)` semantics:
    * rank h = φ·(n−1), result = v⌊h⌋ + (h−⌊h⌋)·(v⌊h⌋₊₁ − v⌊h⌋)).
    *
    * Scale shape: duplicates are first compressed to per-(group, value)
    * counts by an ordinary partial/final hash aggregation — the scalable
    * stage that sees every row — and only DISTINCT values enter the rank
    * window (each value owns the contiguous rank span [cum−cnt, cum−1]).
    * No sketch, no approximation: same interpolated result bit-for-bit. */
  def quantile(vector: DataFrame, phi: Double, grouping: Seq[Column]): DataFrame = {
    // Prometheus quantileAggr: φ outside [0,1] short-circuits to ±Inf (NaN
    // to NaN) for every group, whatever the data
    if (phi < 0 || phi > 1 || phi.isNaN) {
      val v = if (phi.isNaN) Double.NaN
        else if (phi < 0) Double.NegativeInfinity else Double.PositiveInfinity
      return vector.groupBy(grouping: _*).agg(count(lit(1)).as("__graft_n"))
        .select((grouping :+ lit(v).as("value")): _*)
    }
    val counts = vector.groupBy((grouping :+ col("value")): _*)
      .agg(count(lit(1)).as("__graft_cnt"))
    val w = Window.partitionBy(grouping: _*).orderBy(col("value"))
    val ranked = counts
      .withColumn("__graft_cum", sum(col("__graft_cnt")).over(w))
      .withColumn("__graft_n", sum(col("__graft_cnt"))
        .over(Window.partitionBy(grouping: _*)))
    val h = lit(phi) * (col("__graft_n") - 1)
    val lo = floor(h).cast("long")
    ranked
      // spans overlapping ranks {lo, lo+1}: at most two distinct values
      .filter(col("__graft_cum") > lo && col("__graft_cum") - col("__graft_cnt") <= lo + 1)
      .groupBy(grouping: _*)
      .agg(
        min(when(col("__graft_cum") - col("__graft_cnt") <= lo, col("value"))).as("__graft_v_lo"),
        max(when(col("__graft_cum") >= lo + 2, col("value"))).as("__graft_v_hi"),
        first(h - floor(h)).as("__graft_frac"))
      .select((grouping :+
        (col("__graft_v_lo") + col("__graft_frac") *
          (coalesce(col("__graft_v_hi"), col("__graft_v_lo")) - col("__graft_v_lo")))
          .as("value")): _*)
  }

  /** [[quantile]] with a PER-GROUP φ column (data-dependent parameters,
    * e.g. `quantile(scalar(q), v)` — `phiCol` must be functionally
    * dependent on `grouping`, which the per-step scalar join guarantees).
    * Same exact interpolation; the out-of-range short-circuit becomes a
    * per-group union because φ is only known at runtime. */
  def quantileBy(vector: DataFrame, phiCol: Column, grouping: Seq[Column]): DataFrame = {
    val counts = vector.groupBy((grouping :+ col("value")): _*)
      .agg(count(lit(1)).as("__graft_cnt"), first(phiCol).as("__graft_phi"))
    val phi = col("__graft_phi")
    val bad = isnan(phi) || phi < 0.0 || phi > 1.0
    val badGroups = counts.filter(bad).groupBy(grouping: _*)
      .agg(first(phi).as("__graft_phi"))
      .select((grouping :+
        when(isnan(col("__graft_phi")), lit(Double.NaN))
          .when(col("__graft_phi") < 0.0, lit(Double.NegativeInfinity))
          .otherwise(lit(Double.PositiveInfinity)).as("value")): _*)
    val w = Window.partitionBy(grouping: _*).orderBy(col("value"))
    val ranked = counts.filter(!bad)
      .withColumn("__graft_cum", sum(col("__graft_cnt")).over(w))
      .withColumn("__graft_n", sum(col("__graft_cnt"))
        .over(Window.partitionBy(grouping: _*)))
    val h = phi * (col("__graft_n") - 1)
    val lo = floor(h).cast("long")
    ranked
      .filter(col("__graft_cum") > lo && col("__graft_cum") - col("__graft_cnt") <= lo + 1)
      .groupBy(grouping: _*)
      .agg(
        min(when(col("__graft_cum") - col("__graft_cnt") <= lo, col("value"))).as("__graft_v_lo"),
        max(when(col("__graft_cum") >= lo + 2, col("value"))).as("__graft_v_hi"),
        first(h - floor(h)).as("__graft_frac"))
      .select((grouping :+
        (col("__graft_v_lo") + col("__graft_frac") *
          (coalesce(col("__graft_v_hi"), col("__graft_v_lo")) - col("__graft_v_lo")))
          .as("value")): _*)
      .unionByName(badGroups)
  }
}
