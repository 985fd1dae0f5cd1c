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

  /** Exact, order-independent sum of a double column. */
  def dsum(c: Column): Column = sum(c.cast(dec)).cast("double")

  /** avg as exact-sum / count — deterministic double division. */
  def davg(c: Column): Column = sum(c.cast(dec)).cast("double") / count(c)

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

  /** Population stddev (PromQL `stddev` semantics). */
  def dstddevPop(c: Column): Column = {
    val n  = count(c)
    val s  = sum(c.cast(dec)).cast("double")
    val s2 = sum((c * c).cast(dec)).cast("double")
    when(n > 0, sqrt(greatest(lit(0.0), (s2 - s * s / n) / n))).otherwise(lit(null))
  }

  /** Population variance (PromQL `stdvar`). */
  def dvarPop(c: Column): Column = {
    val n  = count(c)
    val s  = sum(c.cast(dec)).cast("double")
    val s2 = sum((c * c).cast(dec)).cast("double")
    when(n > 0, greatest(lit(0.0), (s2 - s * s / n) / n)).otherwise(lit(null))
  }
}
