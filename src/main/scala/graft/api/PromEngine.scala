package graft.api

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._
import graft.promql._

object PromEngine {
  /** A native-histogram sample at the serving boundary — the engine-side
    * analog of Prometheus' API histogram object (model/histogram
    * .FloatHistogram flattened the same way as the storage struct,
    * [[graft.promql.NativeHistograms]]). */
  final case class HistPoint(cnt: Double, hsum: Double, sch: Int, zthr: Double,
                             zcnt: Double, pos: Seq[(Int, Double)],
                             neg: Seq[(Int, Double)],
                             cb: Seq[Double] = Nil) // NHCB custom bounds

  /** `points` carries float samples, `hists` native-histogram samples — a
    * series normally has one or the other, but a type switch mid-series
    * (allowed in Prometheus) yields both, each under its own timestamps. */
  final case class Series(labels: Map[String, String], points: Seq[(Long, Double)],
                          hists: Seq[(Long, HistPoint)] = Nil)

  /** Per-query statistics, the engine-side source of the gRPC
    * `querypb.QueryStats` analog (ref `api/grpc/thanos.go:561-566`):
    * `samplesTotal` = rows produced by the parquet scans feeding the query
    * (read post-execution from the leaf nodes' `numOutputRows` SQL metric —
    * the quantity the reference's stats count as processed samples);
    * `peakSamples` = rows materialized at the driver boundary (our vectorized
    * evaluation holds the whole result grid at once, so the result IS the
    * peak). */
  final case class EngineStats(samplesTotal: Long, peakSamples: Long)

  /** Dictionary-style label introspection a source may provide: answers at
    * chunk/row-group granularity (series with data NEAR the interval — the
    * same contract as the reference's dictionary-resolved label_values,
    * `search/search.go:173-201`, and the parquet-footer shortcut). When
    * present, `/labels` and `/label/:name/values` serve from it with ZERO
    * sample decode — an open raw-TSDB bucket answers off its cached refs. */
  trait LabelIntrospection {
    /** `limit > 0` ⇒ return AT MOST limit+1 entries in canonical sorted
      * order (one extra so the caller can flag truncation), with the bound
      * pushed into the source — an implementation must never materialize
      * the full distinct set just to truncate it afterwards (the reference
      * truncates during materialization, `search/materialize.go:53-58`).
      * Canonical series order = element-wise comparison of the sorted
      * (name, value) pairs, never a concatenated string (collides). */
    def labelValues(label: String, matchers: Seq[LabelMatcher],
                    mintMs: Long, maxtMs: Long, limit: Int = 0): Seq[String]
    def labelNames(matchers: Seq[LabelMatcher],
                   mintMs: Long, maxtMs: Long, limit: Int = 0): Seq[String]
    /** Distinct label sets matching the union of matcher sets — the
      * `/api/v1/series` answer, same zero-decode contract. */
    def series(matchSets: Seq[Seq[LabelMatcher]],
               mintMs: Long, maxtMs: Long, limit: Int = 0): Seq[Map[String, String]]
  }
}

/** Query-engine facade: PromQL string → evaluated result rows (the driver-side
  * collect boundary — same place the reference serializes its SeriesSets,
  * `api/http/query.go:536-564`). */
final class PromEngine(samples: DataFrame,
                       lookbackMs: Long = Eval.DefaultLookbackMs,
                       quotas: graft.limits.Quotas = graft.limits.Quotas(),
                       /** Downsample layers by resolution ms — when present,
                         * aligned long-range `rate`/`increase`/`*_over_time`
                         * are served from the coarsest admissible layer
                         * (Thanos auto-downsampling; [[graft.promql
                         * .LayerRoute]]), bit-exactly, falling back to raw
                         * otherwise. */
                       layers: Map[Long, DataFrame] = Map.empty,
                       /** Native-histogram downsample layers ([[graft.etl
                         * .Downsample.histLayer]]): aligned histogram
                         * rate/increase/delta serve from these. */
                       histLayers: Map[Long, DataFrame] = Map.empty,
                       /** Range-aware source: when present, each query binds
                         * `sourceByRange(lo, hi)` with the AST-derived reach
                         * ([[Compiler.timeBounds]]) instead of the fixed
                         * `samples` frame — a day-listed store (the
                         * reference-bucket reader) then opens only the days
                         * the query can touch, the per-query Block mint/maxt
                         * pruning of `db/db.go:252-258`. `samples` stays the
                         * schema/metadata authority. */
                       sourceByRange: Option[(Long, Long) => DataFrame] = None,
                       /** Matcher-aware range source: like [[sourceByRange]]
                         * but additionally handed the query's selector
                         * matcher SETS ([[Compiler.selectorMatcherSets]] —
                         * OR of per-selector ANDs is the sound prune), so a
                         * raw-block source drops non-matching series before
                         * any chunk I/O, the `PostingsForMatchers` shape.
                         * Preferred over [[sourceByRange]] when both are
                         * set. */
                       sourceByRangeMatching:
                         Option[(Long, Long, Seq[Seq[LabelMatcher]]) => DataFrame] = None,
                       /** When present, label endpoints answer from it with
                         * zero sample decode; see
                         * [[PromEngine.LabelIntrospection]]. */
                       labelIntrospection:
                         Option[PromEngine.LabelIntrospection] = None) {
  import PromEngine._

  private def run(df: DataFrame): Seq[Series] = seriesOf(collectRows(df), df)

  private def boundSamples(ast: graft.promql.Ast.Expr,
                           startMs: Long, endMs: Long): DataFrame =
    sourceByRangeMatching match {
      case Some(f) =>
        val (lo, hi) = Compiler.timeBounds(ast, startMs, endMs, lookbackMs)
        f(lo, hi, Compiler.selectorMatcherSets(ast))
      case None =>
        sourceByRange.fold(samples) { f =>
          val (lo, hi) = Compiler.timeBounds(ast, startMs, endMs, lookbackMs)
          f(lo, hi)
        }
    }

  private def rangedSamples(mintMs: Long, maxtMs: Long,
                            sets: Seq[Seq[LabelMatcher]] = Seq.empty): DataFrame =
    sourceByRangeMatching.map(_(mintMs, maxtMs, sets))
      .getOrElse(sourceByRange.fold(samples)(_(mintMs, maxtMs)))

  private def collectRows(df: DataFrame): Seq[Row] =
    quotas.collect(df).toSeq // pre-flight + mid-scan byte charge

  private def seriesOf(rows: Seq[Row], df: DataFrame): Seq[Series] = {
    val hasH = df.columns.contains("__graft_h")
    val lbls = Compiler.labelCols(df).filterNot(_ == "__graft_h")
    def histOf(r: Row): Option[HistPoint] =
      if (!hasH || r.isNullAt(r.fieldIndex("__graft_h"))) None
      else {
        val h = r.getAs[Row]("__graft_h")
        def side(f: String): Seq[(Int, Double)] =
          h.getAs[scala.collection.Seq[Row]](f).toSeq
            .map(b => (b.getAs[Int]("idx"), b.getAs[Double]("c")))
        Some(HistPoint(h.getAs[Double]("cnt"), h.getAs[Double]("hsum"),
          h.getAs[Int]("sch"), h.getAs[Double]("zthr"), h.getAs[Double]("zcnt"),
          side("pos"), side("neg"),
          Option(h.getAs[scala.collection.Seq[Double]]("cb"))
            .map(_.toSeq).getOrElse(Nil)))
      }
    rows
      .filter(r => !r.isNullAt(r.fieldIndex("value")))
      .groupBy(r => lbls.flatMap(l =>
        Option(r.getAs[Any](l)).map(v => l -> v.toString)).toMap)
      .map { case (labelMap, rs) =>
        val (histRows, floatRows) = rs.partition(histOf(_).isDefined)
        Series(labelMap,
          floatRows.map(r =>
            (r.getAs[Long]("step_ms"), toD(r.getAs[Any]("value")))).sortBy(_._1),
          histRows.flatMap(r => histOf(r).map(h =>
            (r.getAs[Long]("step_ms"), h))).sortBy(_._1))
      }
      .toSeq.sortBy(_.labels.toSeq.sorted.mkString(","))
  }

  /** Sum of `numOutputRows` over the executed plan's scan leaves — only
    * meaningful AFTER an action ran on this exact DataFrame. AQE wraps the
    * tree in childless `AdaptiveSparkPlanExec` / `QueryStageExec` shells, so
    * those unwrap to their inner physical plans first. */
  private def scannedRows(df: DataFrame): Long = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def leaves(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => leaves(a.executedPlan)
      case q: QueryStageExec        => leaves(q.plan)
      case _ if p.children.isEmpty && p.subqueries.isEmpty => Seq(p)
      case _ => (p.children ++ p.subqueries).flatMap(leaves)
    }
    leaves(df.queryExecution.executedPlan)
      .filter(_.children.isEmpty) // scan leaves only, not unwrapped shells
      .flatMap(_.metrics.get("numOutputRows"))
      .map(_.value).sum
  }

  private def toD(v: Any): Double = v match {
    case d: Double => d
    case l: Long => l.toDouble
    case i: Int => i.toDouble
    case d: java.math.BigDecimal => d.doubleValue()
    case null => Double.NaN
  }

  def instantQuery(promql: String, tMs: Long): Seq[Series] =
    instantQueryWithStats(promql, tMs)._1

  def rangeQuery(promql: String, startMs: Long, endMs: Long, stepMs: Long): Seq[Series] =
    rangeQueryWithStats(promql, startMs, endMs, stepMs)._1

  /** Layers admissible under a per-query resolution cap — Thanos'
    * `max_source_resolution` request parameter (0 ⇒ raw data only). */
  private def cappedLayers(maxSourceResMs: Long): Map[Long, DataFrame] =
    layers.filter { case (res, _) => res <= maxSourceResMs }

  private def cappedHistLayers(maxSourceResMs: Long): Map[Long, DataFrame] =
    histLayers.filter { case (res, _) => res <= maxSourceResMs }

  /** Instant query + per-query stats + static analyzer warnings (the
    * annotation channel the reference streams before results,
    * `api/grpc/thanos.go:270-276`). */
  def instantQueryWithStats(promql: String, tMs: Long,
                            maxSourceResMs: Long = Long.MaxValue)
      : (Seq[Series], EngineStats, Seq[String]) = {
    val ast = Parser.parse(promql)
    val ctx = Compiler.Ctx(boundSamples(ast, tMs, tMs), tMs, tMs,
      stepMs = 1000L, lookbackMs,
      layers = cappedLayers(maxSourceResMs),
      histLayers = cappedHistLayers(maxSourceResMs))
    val (df, mixed) = Compiler.compileServingAnnotated(ast, ctx)
    // materialize the (tiny, usually empty) mixed-keys frame ONCE into the
    // block cache: the warning probe below warms it and the result plan's
    // anti-joins reuse it instead of re-evaluating both typed subtrees
    mixed.foreach(_.persist())
    try finish(df, Compiler.staticWarnings(ast) ++ mixedWarning(mixed))
    finally mixed.foreach(_.unpersist(false))
  }

  def rangeQueryWithStats(promql: String, startMs: Long, endMs: Long, stepMs: Long,
                          maxSourceResMs: Long = Long.MaxValue)
      : (Seq[Series], EngineStats, Seq[String]) = {
    val ast = Parser.parse(promql)
    val ctx = Compiler.Ctx(boundSamples(ast, startMs, endMs), startMs, endMs,
      stepMs, lookbackMs,
      layers = cappedLayers(maxSourceResMs),
      histLayers = cappedHistLayers(maxSourceResMs))
    val (df, mixed) = Compiler.compileServingAnnotated(ast, ctx)
    // materialize the (tiny, usually empty) mixed-keys frame ONCE into the
    // block cache: the warning probe below warms it and the result plan's
    // anti-joins reuse it instead of re-evaluating both typed subtrees
    mixed.foreach(_.persist())
    try finish(df, Compiler.staticWarnings(ast) ++ mixedWarning(mixed))
    finally mixed.foreach(_.unpersist(false))
  }

  /** Eval-time MixedFloatsHistograms annotation (Prometheus drops an
    * aggregation group mixing sample types and warns; the keys frame is
    * tiny — empty in every pure store — so the existence probe is cheap). */
  private def mixedWarning(mixed: Option[DataFrame]): Seq[String] =
    if (mixed.exists(!_.isEmpty))
      Seq("encountered a mix of histograms and floats for aggregation; mixed groups are dropped from the result")
    else Nil

  private def finish(df: DataFrame, warnings: Seq[String])
      : (Seq[Series], EngineStats, Seq[String]) = {
    val rows = collectRows(df)
    val out = seriesOf(rows, df)
    (out, EngineStats(scannedRows(df), rows.size.toLong), warnings)
  }

  /** `/api/v1/series`: union of matcher sets (match[] = OR, ref
    * `api/http/query.go:627-633`), dedup across sets. */
  def series(matchSets: Seq[Seq[LabelMatcher]], mintMs: Long, maxtMs: Long,
             limit: Int = 0): (Seq[Map[String, String]], Boolean) = {
    labelIntrospection.foreach { li =>
      // limit is PUSHED to the source: the introspection contract returns
      // ≤ limit+1 canonically-sorted entries, never the full distinct set
      val got = li.series(matchSets, mintMs, maxtMs, limit)
      val truncated = limit > 0 && got.size > limit
      return (if (truncated) got.take(limit) else got, truncated)
    }
    val lbls = labelColumns
    // canonical order = element-wise comparison of the sorted (name, value)
    // pairs — the SAME key the introspection backends sort by, so a limited
    // /series returns the same subset regardless of which backend answers.
    // (Ordering by the raw label columns nulls-first disagrees with pair
    // order for absent labels; a concatenated string key collides.)
    val kvKey = filter(
      array(lbls.sorted.map(l =>
        struct(lit(l).as("key"), col(l).as("value"))): _*),
      e => e.getField("value").isNotNull)
    val selected = Eval.selectUnion(rangedSamples(mintMs, maxtMs, matchSets), matchSets, mintMs, maxtMs)
      .select(lbls.map(col): _*)
      .distinct().withColumn("__graft_kv", kvKey).orderBy(col("__graft_kv"))
    val rows = (if (limit > 0) selected.limit(limit + 1) else selected).collect().toSeq
    val truncated = limit > 0 && rows.size > limit
    val out = (if (truncated) rows.take(limit) else rows).map(rowToLabels(lbls, _))
    (out, truncated)
  }

  /** Columns per `labelNames` fallback aggregate — large enough that any
    * realistic schema fits in one pass, small enough that Janino compiles
    * each batch without interpreted fallback. */
  private val LabelNamesAggBatch = 1024

  /** Label columns of the wide samples schema: the STRING columns minus
    * the sample/meta payload — a native-histogram column (h, struct) is a
    * sample value and must not surface as a label name/value. */
  private def labelColumns: Seq[String] = samples.schema.fields.iterator
    .filter(_.dataType == org.apache.spark.sql.types.StringType)
    .map(_.name)
    .filterNot(Set("ts_ms", "value", "sample_id", "series_hash", "date")).toSeq

  def labelNames(matchers: Seq[LabelMatcher], mintMs: Long, maxtMs: Long): Seq[String] = {
    labelIntrospection.foreach { li =>
      return li.labelNames(matchers, mintMs, maxtMs).sorted
    }
    val lbls = labelColumns
    // footer fast path first (matcherless only): per-row-group statistics
    // prove which labels actually carry values INSIDE the interval (the
    // reference reads per-block schemas within range, search/search.go:294).
    // Non-file-backed views (decode-on-read stores, bounded bucket frames)
    // fall through to the count scan — the answer must stay DATA-driven: a
    // label column existing in the schema is not a label present in range.
    val viaFooter =
      if (matchers.isEmpty)
        graft.sources.FooterLabelValues.labelNames(
          rangedSamples(mintMs, maxtMs), lbls, mintMs, maxtMs)
      else None
    viaFooter.getOrElse {
      val m = Eval.select(rangedSamples(mintMs, maxtMs, Seq(matchers)), matchers, mintMs, maxtMs)
      // BATCHED count aggregate: a single aggregate over every label column
      // is a codegen stress at the reference's own ≤32k-column schema cap
      // (method-split churn, then interpreted fallback). Each batch's scan
      // reads only its column slice (columnar pruning), so total I/O over
      // all batches matches the one wide pass; job overhead is ~32 cheap
      // aggregates at the ceiling, zero extra at typical (<1k) widths.
      lbls.grouped(LabelNamesAggBatch).flatMap { batch =>
        val counts = m.agg(count(col(batch.head)).as(batch.head),
          batch.tail.map(l => count(col(l)).as(l)): _*).collect()(0)
        batch.filter(l => counts.getAs[Long](l) > 0)
      }.toSeq.sorted
    }
  }

  def labelValues(label: String, matchers: Seq[LabelMatcher], mintMs: Long,
                  maxtMs: Long, limit: Int = 0): (Seq[String], Boolean) = {
    if (!labelColumns.contains(label)) return (Seq.empty, false)
    labelIntrospection.foreach { li =>
      val vals = li.labelValues(label, matchers, mintMs, maxtMs, limit)
      val truncated = limit > 0 && vals.size > limit
      return (if (truncated) vals.take(limit) else vals, truncated)
    }
    // no-matcher shortcut (ref search/search.go:173-201): resolve from the
    // parquet dictionary pages + footer stats, scanning only the interval's
    // boundary files — exact, falls back to the scan when inapplicable
    if (matchers.isEmpty)
      graft.sources.FooterLabelValues.labelValues(rangedSamples(mintMs, maxtMs), label, mintMs, maxtMs)
        .foreach { vals =>
          val truncated = limit > 0 && vals.size > limit
          return (if (truncated) vals.take(limit) else vals, truncated)
        }
    val vals = Eval.select(rangedSamples(mintMs, maxtMs, Seq(matchers)), matchers, mintMs, maxtMs)
      .select(col(label)).na.drop().distinct().orderBy(col(label))
    val rows = (if (limit > 0) vals.limit(limit + 1) else vals).collect().toSeq
    val truncated = limit > 0 && rows.size > limit
    ((if (truncated) rows.take(limit) else rows).map(_.getString(0)), truncated)
  }

  private def rowToLabels(lbls: Seq[String], r: Row): Map[String, String] =
    lbls.flatMap(l => Option(r.getAs[Any](l)).map(v => l -> v.toString)).toMap
}
