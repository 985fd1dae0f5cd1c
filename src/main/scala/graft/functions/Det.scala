package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic numeric helpers.
  *
  * Floating-point SUM/AVG over a shuffled Dataset is order-dependent; at
  * cluster scale the partial-aggregation order is nondeterministic, so two
  * runs (or Spark vs an oracle engine) can disagree in the last ulp. We route
  * additive aggregates through DECIMAL(38,9): exact, commutative, overflow-safe
  * for ~1e28 of headroom, and still codegen'd (no UDFs). Cast back to DOUBLE at
  * the end for a compact result.
  *
  * The reference never sums floats across threads (single-goroutine per-series
  * iteration), so it silently gets determinism; on Spark we must buy it
  * explicitly.
  */
object Det {
  val dec: DecimalType = DecimalType(38, 9)

  /** Non-finite doubles don't survive the DECIMAL route (cast → NULL), so
    * restore IEEE semantics explicitly: any NaN — or +Inf and −Inf together —
    * poisons the sum to NaN; one infinity sign dominates; else the exact
    * decimal result. Order-independent like the decimal sum itself. */
  private def ieee(c: Column, finite: Column): Column = {
    val anyNaN = max(when(isnan(c), true).otherwise(false))
    val anyPos = max(when(c === Double.PositiveInfinity, true).otherwise(false))
    val anyNeg = max(when(c === Double.NegativeInfinity, true).otherwise(false))
    when(anyNaN || (anyPos && anyNeg), Double.NaN)
      .when(anyPos, Double.PositiveInfinity)
      .when(anyNeg, Double.NegativeInfinity)
      .otherwise(finite)
  }

  /** Exact, order-independent sum of a double column. */
  def dsum(c: Column): Column = ieee(c, sum(c.cast(dec)).cast("double"))

  /** avg as exact-sum / count — deterministic double division. */
  def davg(c: Column): Column = ieee(c, sum(c.cast(dec)).cast("double") / count(c))

  /** Sample stddev via decimal-exact moments (x² computed per-row in double, then cast): sqrt((Σx² − (Σx)²/n)/(n−1)).
    * Deterministic because both moments are decimal-exact; the final few ops
    * are a fixed sequence of double arithmetic. NULL when n < 2 (PromQL
    * stddev is population — see [[dstddevPop]]). */
  def dstddevSamp(c: Column): Column = {
    val n  = count(c)
    val s  = sum(c.cast(dec)).cast("double")
    val s2 = sum((c * c).cast(dec)).cast("double")
    when(n > 1, sqrt(greatest(lit(0.0), (s2 - s * s / n) / (n - lit(1))))).otherwise(lit(null))
  }

  /** Any non-finite observation makes a deviation moment NaN (mean ±Inf →
    * dev Inf−Inf), matching Welford over IEEE doubles. */
  private def nanNonFinite(c: Column, finite: Column): Column =
    when(max(when(isnan(c) || abs(c) === Double.PositiveInfinity, true)
      .otherwise(false)), Double.NaN).otherwise(finite)

  /** Population stddev (PromQL `stddev` semantics). */
  def dstddevPop(c: Column): Column = {
    val n  = count(c)
    val s  = sum(c.cast(dec)).cast("double")
    val s2 = sum((c * c).cast(dec)).cast("double")
    nanNonFinite(c,
      when(n > 0, sqrt(greatest(lit(0.0), (s2 - s * s / n) / n))).otherwise(lit(null)))
  }

  /** Population variance (PromQL `stdvar`). */
  def dvarPop(c: Column): Column = {
    val n  = count(c)
    val s  = sum(c.cast(dec)).cast("double")
    val s2 = sum((c * c).cast(dec)).cast("double")
    nanNonFinite(c,
      when(n > 0, greatest(lit(0.0), (s2 - s * s / n) / n)).otherwise(lit(null)))
  }
}
