package graft.promql

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Vector selection — the `Select` storage operator + PromQL's instant/range
  * evaluation grid (SURVEY.md §2.3 J4, §2.5 W4).
  *
  * The reference materializes per-row-group row ranges and hands a SeriesSet
  * to promql-engine, which evaluates an as-of ("lookback") semantics per grid
  * step (`cmd/serve.go:102,217`: lookback 5m). Spark-first re-expression:
  *
  *  - instant vector at time t  →  `filter(ts ∈ (t−lookback, t])` then
  *    `groupBy(series).agg(max_by(value, ts))` — one shuffle, map-side
  *    partial agg, no window function needed.
  *
  *  - range grid (start, end, step) → **bounded fan-out, not a range join**:
  *    each sample can serve at most ⌈lookback/step⌉ grid steps, so we
  *    `explode(sequence(kmin, kmax))` per sample and aggregate
  *    `max_by(value, ts)` per (series, step). At 100 TB the naive
  *    `samples × steps` theta-join is quadratic and unshuffleable; this
  *    fan-out is linear in samples with a small constant (lookback/step) and
  *    aggregates with ordinary partial/final hash aggregation.
  */
object Eval {
  val DefaultLookbackMs: Long = 300000L // 5m, ref cmd/serve.go:102

  /** Label columns = everything that isn't engine bookkeeping — schema-driven
    * so sources with extra labels (e.g. histogram `le`) work unchanged. */
  def labelColsOf(samples: DataFrame): Seq[org.apache.spark.sql.Column] =
    samples.columns
      .filterNot(Set("ts_ms", "value", "sample_id", "series_hash", "date",
        "__graft_oldname"))
      .filterNot(c => isHistCol(samples, c))
      .toSeq.map(col)

  /** The histogram sample column is `h` AND struct-typed — a data-borne
    * string label that happens to be named "h" stays a label (the same
    * data-borne-name discipline as the __graft_ prefix convention). */
  def isHistCol(samples: DataFrame, c: String): Boolean =
    c == "h" && samples.schema(c).dataType
      .isInstanceOf[org.apache.spark.sql.types.StructType]

  /** Time-interval predicate (ref `internal/util/interval.go:8-21`). When the
    * source is the converted layout (has a `date` partition column), also emit
    * the equivalent date-range predicate so Catalyst prunes day partitions —
    * the analog of the reference's block mint/maxt filter (`db/db.go:252-258`).
    * yyyy-MM-dd strings compare lexicographically = chronologically. */
  def timeBound(samples: DataFrame, mintMs: Long, maxtMs: Long): org.apache.spark.sql.Column = {
    val ts = col("ts_ms").between(mintMs, maxtMs)
    if (!samples.columns.contains("date")) ts
    else {
      val fmt = java.time.format.DateTimeFormatter.ISO_LOCAL_DATE
      // clamp to [epoch, year 9999]: partition discovery types `date` as DATE,
      // and an unbounded query's ±Long.MaxValue/2 bound would format to a
      // year no DATE literal can hold
      val hi = 253402214400000L // 9999-01-01T00:00:00Z
      def day(ms: Long) = java.time.Instant.ofEpochMilli(ms.max(0L).min(hi))
        .atZone(java.time.ZoneOffset.UTC).toLocalDate.format(fmt)
      ts && col("date") >= day(mintMs) && col("date") <= day(maxtMs)
    }
  }

  /** Raw select: time + matcher predicates; both push down to the scan. */
  def select(samples: DataFrame, matchers: Seq[LabelMatcher],
             mintMs: Long, maxtMs: Long): DataFrame =
    samples.filter(timeBound(samples, mintMs, maxtMs) &&
      Matchers.compile(samples, matchers))

  /** `match[]`: union of matcher sets in ONE scan — the OR of the per-set
    * predicates. The reference unions row ranges inside a single scan
    * (`db/db.go:385-409`); a union of two selects would scan twice and pay a
    * global dedup shuffle for rows the OR-predicate dedups for free. */
  def selectUnion(samples: DataFrame, matchSets: Seq[Seq[LabelMatcher]],
                  mintMs: Long, maxtMs: Long): DataFrame =
    samples.filter(timeBound(samples, mintMs, maxtMs) &&
      matchSets.map(ms => Matchers.compile(samples, ms)).reduce(_ || _))

  /** Instant vector: last sample per series in (t−lookback, t]. A series
    * whose most recent sample is the staleness marker is absent at t
    * (Prometheus lookback-delta semantics; an ordinary NaN is a value). */
  def instantVector(samples: DataFrame, matchers: Seq[LabelMatcher],
                    tMs: Long, lookbackMs: Long = DefaultLookbackMs): DataFrame =
    samples
      .filter(timeBound(samples, tMs - lookbackMs + 1, tMs) &&
        Matchers.compile(samples, matchers))
      .groupBy(col("series_hash") +: labelColsOf(samples): _*)
      .agg(max_by(col("value"), col("ts_ms")).as("value"),
           max(col("ts_ms")).as("ts_ms"))
      .filter(!graft.functions.IsStale(col("value")))

  /** floor division for possibly-negative numerators (Spark's integer division
    * truncates toward zero; the grid index math needs floor semantics). */
  private def floorDiv(a: org.apache.spark.sql.Column, b: Long) =
    ((a - pmod(a, lit(b))) / b).cast("long")

  /** Range query: instant-vector semantics evaluated at every grid step
    * `start + k*step <= end`. Output: one row per (series, step) that has at
    * least one sample in its lookback window. */
  def rangeVectors(samples: DataFrame, matchers: Seq[LabelMatcher],
                   startMs: Long, endMs: Long, stepMs: Long,
                   lookbackMs: Long = DefaultLookbackMs,
                   keepTs: Boolean = false,
                   keepH: Boolean = false): DataFrame = {
    val nSteps = (endMs - startMs) / stepMs // max k
    val base = samples.filter(
      timeBound(samples, startMs - lookbackMs + 1, endMs) &&
        Matchers.compile(samples, matchers))
    // sample at ts serves step s iff ts <= s < ts + lookback
    val kMin = greatest(floorDiv(col("ts_ms") - startMs + stepMs - 1, stepMs), lit(0L))
    val kMax = least(floorDiv(col("ts_ms") - startMs + lookbackMs - 1, stepMs), lit(nSteps))
    base
      .withColumn("__graft_k", explode(when(kMax >= kMin, sequence(kMin, kMax, lit(1L)))
        .otherwise(array().cast("array<long>"))))
      .withColumn("step_ms", lit(startMs) + col("__graft_k") * stepMs)
      .groupBy(col("series_hash") +: col("step_ms") +: labelColsOf(samples): _*)
      .agg(max_by(col("value"), col("ts_ms")).as("value"),
        // timestamp() needs the selected sample's own time, not the step's
        (if (keepTs) Seq(max(col("ts_ms")).as("__graft_sample_ts")) else Nil) ++
        // histogram-typed samples ride along under an engine-owned name
        (if (keepH && samples.columns.contains("h") && isHistCol(samples, "h"))
           Seq(max_by(col("h"), col("ts_ms")).as("__graft_h")) else Nil): _*)
      .filter(!graft.functions.IsStale(col("value"))) // stale at step ⇒ absent
  }
}
