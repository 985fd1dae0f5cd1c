package graft.api

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.promql._

/** Query-engine facade: PromQL string → evaluated result rows (the driver-side
  * collect boundary — same place the reference serializes its SeriesSets,
  * `api/http/query.go:536-564`). */
final class PromEngine(samples: DataFrame,
                       lookbackMs: Long = Eval.DefaultLookbackMs,
                       quotas: graft.limits.Quotas = graft.limits.Quotas()) {

  final case class Series(labels: Map[String, String], points: Seq[(Long, Double)])

  private def run(df: DataFrame): Seq[Series] = {
    val lbls = Compiler.labelCols(df)
    val rows = quotas.guard(df).collect().toSeq
    rows
      .filter(r => !r.isNullAt(r.fieldIndex("value")))
      .groupBy(r => lbls.flatMap(l =>
        Option(r.getAs[Any](l)).map(v => l -> v.toString)).toMap)
      .map { case (labelMap, rs) =>
        Series(labelMap, rs.map(r =>
            (r.getAs[Long]("step_ms"), toD(r.getAs[Any]("value")))).sortBy(_._1))
      }
      .toSeq.sortBy(_.labels.toSeq.sorted.mkString(","))
  }

  private def toD(v: Any): Double = v match {
    case d: Double => d
    case l: Long => l.toDouble
    case i: Int => i.toDouble
    case d: java.math.BigDecimal => d.doubleValue()
    case null => Double.NaN
  }

  def instantQuery(promql: String, tMs: Long): Seq[Series] = {
    val ast = Parser.parse(promql)
    val ctx = Compiler.Ctx(samples, tMs, tMs, stepMs = 1000L, lookbackMs)
    run(Compiler.compile(ast, ctx))
  }

  def rangeQuery(promql: String, startMs: Long, endMs: Long, stepMs: Long): Seq[Series] = {
    val ast = Parser.parse(promql)
    val ctx = Compiler.Ctx(samples, startMs, endMs, stepMs, lookbackMs)
    run(Compiler.compile(ast, ctx))
  }

  /** `/api/v1/series`: union of matcher sets (match[] = OR, ref
    * `api/http/query.go:627-633`), dedup across sets. */
  def series(matchSets: Seq[Seq[LabelMatcher]], mintMs: Long, maxtMs: Long,
             limit: Int = 0): (Seq[Map[String, String]], Boolean) = {
    val lbls = samples.columns.filterNot(Set("ts_ms", "value", "sample_id", "series_hash", "date")).toSeq
    val selected = Eval.selectUnion(samples, matchSets, mintMs, maxtMs)
      .select(lbls.map(col): _*)
      .distinct().orderBy(lbls.map(col): _*)
    val rows = (if (limit > 0) selected.limit(limit + 1) else selected).collect().toSeq
    val truncated = limit > 0 && rows.size > limit
    val out = (if (truncated) rows.take(limit) else rows).map(rowToLabels(lbls, _))
    (out, truncated)
  }

  def labelNames(matchers: Seq[LabelMatcher], mintMs: Long, maxtMs: Long): Seq[String] = {
    val lbls = samples.columns.filterNot(Set("ts_ms", "value", "sample_id", "series_hash", "date")).toSeq
    if (matchers.isEmpty) lbls.sorted // schema-only path (ref search/search.go:294)
    else {
      val m = Eval.select(samples, matchers, mintMs, maxtMs)
      val counts = m.agg(count(col(lbls.head)).as(lbls.head),
        lbls.tail.map(l => count(col(l)).as(l)): _*).collect()(0)
      lbls.filter(l => counts.getAs[Long](l) > 0).sorted
    }
  }

  def labelValues(label: String, matchers: Seq[LabelMatcher], mintMs: Long,
                  maxtMs: Long, limit: Int = 0): (Seq[String], Boolean) = {
    if (!samples.columns.contains(label)) return (Seq.empty, false)
    val vals = Eval.select(samples, matchers, mintMs, maxtMs)
      .select(col(label)).na.drop().distinct().orderBy(col(label))
    val rows = (if (limit > 0) vals.limit(limit + 1) else vals).collect().toSeq
    val truncated = limit > 0 && rows.size > limit
    ((if (truncated) rows.take(limit) else rows).map(_.getString(0)), truncated)
  }

  private def rowToLabels(lbls: Seq[String], r: Row): Map[String, String] =
    lbls.flatMap(l => Option(r.getAs[Any](l)).map(v => l -> v.toString)).toMap
}
