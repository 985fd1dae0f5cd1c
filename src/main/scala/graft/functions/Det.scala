package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic numeric helpers.
  *
  * Floating-point SUM/AVG over a shuffled Dataset is order-dependent; at
  * cluster scale the partial-aggregation order is nondeterministic, so two
  * runs (or Spark vs an oracle engine) can disagree in the last ulp. We route
  * additive aggregates through DECIMAL(38,9): exact, commutative, and still
  * codegen'd (no UDFs). Cast back to DOUBLE at the end for a compact result.
  *
  * The decimal route has a MAGNITUDE CEILING (~1e29 per cast; v² for the
  * moments). Under ANSI mode (the Spark 4 default) a finite double beyond it
  * doesn't even go NULL — the cast THROWS, killing the whole query for one
  * extreme sample. Prometheus itself accumulates in float64 (Kahan sum,
  * Welford moments), so these helpers band the decimal path: every cast
  * input is pre-filtered to the safe band (aggregate branches evaluate
  * unconditionally — guarding the OUTPUT with `when` is not enough), and a
  * group containing any out-of-band value takes a double-aggregation
  * fallback instead — bit-for-bit Prometheus-shaped (overflow to ±Inf and
  * all), order-dependent only at ulp level, and only in the extreme band
  * where the reference engine is equally float-bound. The oracle-checked
  * common band stays on the exact decimal path. Band headroom: ~1e11 rows
  * per GROUP of worst-case in-band values before the decimal sum itself
  * could overflow.
  *
  * The reference never sums floats across threads (single-goroutine
  * per-series iteration), so it silently gets determinism; on Spark we must
  * buy it explicitly.
  */
object Det {
  val dec: DecimalType = DecimalType(38, 9)

  /** Finite |v| at/above this leaves the decimal sum route (cast ceiling
    * ~1e29, minus ~1e11 rows of group-sum headroom). The LOW end is NOT
    * banded: DECIMAL(38,9) quantizes at 1e-9 absolute — a documented
    * precision floor — because any data-dependent reroute to float
    * arithmetic breaks the engine's bit-identity contracts (layer-routed ≡
    * raw, run ≡ run) for ordinary data the moment one tiny sample lands in
    * a group. Determinism wins below the quantum; Prometheus-float
    * semantics win above the ceiling, where decimal would THROW. */
  private val SumSafe = 1e18
  /** The moments square each value, so their band is the square root of the
    * sum band. */
  private val MomentSafe = 1e9
  /** Exact power-of-two rescale for the big-band mean: scaling is lossless
    * for normal doubles, and 2⁻⁶⁴ keeps even near-max values summable
    * across ~1e19 rows without overflow. */
  private val Scale = java.lang.Math.pow(2.0, -64)
  private val InvScale = java.lang.Math.pow(2.0, 64)

  private def isFinite(c: Column): Column =
    !isnan(c) && abs(c) =!= Double.PositiveInfinity

  /** Any finite group member at/above `bound` (aggregate predicate). */
  private def anyAbove(c: Column, bound: Double): Column =
    max(when(isFinite(c) && abs(c) >= bound, true).otherwise(false))

  /** The value where it is decimal-safe, NULL outside — the only shape that
    * may reach a decimal cast (ANSI would throw on the raw value). */
  private def inBand(c: Column, bound: Double): Column =
    when(isFinite(c) && abs(c) < bound, c)

  /** Non-finite doubles can't take the DECIMAL route, so restore IEEE
    * semantics explicitly: any NaN — or +Inf and −Inf together — poisons
    * the sum to NaN; one infinity sign dominates; else the finite-branch
    * result. Order-independent like the decimal sum itself. */
  private def ieee(c: Column, finite: Column): Column = {
    val anyNaN = max(when(isnan(c), true).otherwise(false))
    val anyPos = max(when(c === Double.PositiveInfinity, true).otherwise(false))
    val anyNeg = max(when(c === Double.NegativeInfinity, true).otherwise(false))
    when(anyNaN || (anyPos && anyNeg), Double.NaN)
      .when(anyPos, Double.PositiveInfinity)
      .when(anyNeg, Double.NegativeInfinity)
      .otherwise(finite)
  }

  /** Exact, order-independent sum of a double column; Prometheus float
    * semantics (±Inf on overflow, huge values kept) outside the safe band. */
  def dsum(c: Column): Column = {
    val dbl = sum(when(isFinite(c), c))
    ieee(c, when(anyAbove(c, SumSafe), dbl)
      .otherwise(sum(inBand(c, SumSafe).cast(dec)).cast("double")))
  }

  /** avg as exact-sum / count — deterministic double division. The big band
    * computes the mean over exactly-rescaled values (Prometheus's
    * incremental mean likewise avoids the float sum overflow: the average
    * of near-max values is near-max, not +Inf). */
  def davg(c: Column): Column = {
    val n = count(c)
    val dblBig = sum(when(isFinite(c), c) * lit(Scale)) / n * lit(InvScale)
    ieee(c, when(anyAbove(c, SumSafe), dblBig)
      .otherwise(sum(inBand(c, SumSafe).cast(dec)).cast("double") / n))
  }

  /** Decimal-exact central moment (s2 − s²/n)/n over banded inputs. */
  private def decMoment(c: Column, n: Column): Column = {
    val b  = inBand(c, MomentSafe)
    val s  = sum(b.cast(dec)).cast("double")
    val s2 = sum((b * b).cast(dec)).cast("double")
    greatest(lit(0.0), (s2 - s * s / n) / n)
  }

  /** Population variance with the big-band fallback: Spark's `var_pop` is a
    * Welford-merge central-moment aggregate — numerically stable at any
    * magnitude, exactly the accumulation Prometheus's stdvar runs. */
  private def varPopSafe(c: Column): Column = {
    val n = count(c)
    when(n > 0,
      when(anyAbove(c, MomentSafe), coalesce(var_pop(c), lit(0.0)))
        .otherwise(decMoment(c, n)))
  }

  /** Any non-finite observation makes a deviation moment NaN (mean ±Inf →
    * dev Inf−Inf), matching Welford over IEEE doubles. */
  private def nanNonFinite(c: Column, finite: Column): Column =
    when(max(when(isnan(c) || abs(c) === Double.PositiveInfinity, true)
      .otherwise(false)), Double.NaN).otherwise(finite)

  /** Sample stddev: sqrt(n/(n−1) · population variance), NULL when n < 2
    * (PromQL stddev is population — see [[dstddevPop]]). */
  def dstddevSamp(c: Column): Column = {
    val n = count(c)
    when(n > 1, sqrt(varPopSafe(c) * n / (n - lit(1)))).otherwise(lit(null))
  }

  /** Population stddev (PromQL `stddev` semantics). */
  def dstddevPop(c: Column): Column = nanNonFinite(c, sqrt(varPopSafe(c)))

  /** Population variance (PromQL `stdvar`). */
  def dvarPop(c: Column): Column = nanNonFinite(c, varPopSafe(c))
}
