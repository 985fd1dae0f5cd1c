package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

import graft.functions.{ChunkDecode, HistChunkDecode}

/** Optimizer rule: push query-time bounds through the chunk decode.
  *
  * The chunked layout ([[graft.etl.Ingest.convertChunked]]) stores one row
  * per (series, 8h window) with Gorilla-encoded bytes plus the frame's
  * `mint`/`maxt` sample-time stats. Reading it goes
  * `Generate(Explode(ChunkDecode(data)))` → project `ts_ms`/`value`. A query
  * filter on `ts_ms` references the generator's output, so Catalyst's own
  * predicate pushdown stops at the Generate — every frame would be decoded
  * only to have its points discarded above.
  *
  * Since the writer guarantees `mint ≤ p.ts_ms ≤ maxt` for every decoded
  * point `p`, a bound `ts_ms ∈ [lo, hi]` implies a frame can only contribute
  * if `maxt ≥ lo AND mint ≤ hi`. This rule finds such bounds, walks them to
  * the Generate they select from, and injects the frame-overlap predicate
  * BELOW it — where Parquet pushdown turns it into row-group/page pruning on
  * the sorted `mint`/`maxt` stat columns. The Spark analog of the
  * reference's row-range intersection before chunk materialization
  * (`search/materialize.go:42-105`, `internal/util/interval.go:8-21`):
  * frames outside the query window are never decompressed, and with this
  * rule that holds for ANY plan over [[graft.etl.Ingest.openChunkedSamples]]
  * — the PromQL engine included — not just the hand-pruned
  * [[graft.etl.Ingest.selectChunkedSamples]] path.
  *
  * Conservative by construction: it only fires when the filtered `ts_ms`
  * column provably resolves (through Project/Filter chains) to the `ts_ms`
  * field of an `Explode(ChunkDecode(_))` output, and the original `ts_ms`
  * filter stays in place — the injected predicate prunes frames, never
  * points. Strict bounds (`<`,`>`) are widened to non-strict, which is safe
  * (a kept frame is merely decoded and re-filtered above). */
object ChunkFramePrune extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case f @ Filter(cond, child) => rewrite(f, cond, child).getOrElse(f)
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case o => Seq(o)
  }

  /** The `ts_ms` shapes a bound can reference: a named attribute produced by
    * a downstream projection, or (post-pushdown) the struct field extracted
    * straight from the generator output. */
  private sealed trait TsSrc
  private final case class Named(a: Attribute) extends TsSrc
  private final case class StructOut(a: Attribute) extends TsSrc

  private def tsSource(e: Expression): Option[TsSrc] = e match {
    case a: AttributeReference if a.name == "ts_ms" && a.dataType == LongType =>
      Some(Named(a)) // resolve through projects to the struct attribute
    case g @ GetStructField(a: AttributeReference, _, _) if fieldName(g) == "ts_ms" =>
      Some(StructOut(a)) // already the generator's struct output
    case _ => None
  }

  private def fieldName(g: GetStructField): String =
    g.childSchema(g.ordinal).name

  private def longLit(e: Expression): Option[Long] = e match {
    case Literal(v: Long, LongType) => Some(v)
    case Literal(v: Int, _)         => Some(v.toLong)
    case _ => None
  }

  /** Extract (source, isLower, bound) from one conjunct; strict bounds widen
    * to non-strict (safe for pruning). */
  private def bound(e: Expression): Option[(TsSrc, Boolean, Long)] =
    e match {
      case GreaterThanOrEqual(t, v) => for (s <- tsSource(t); l <- longLit(v)) yield (s, true, l)
      case GreaterThan(t, v)        => for (s <- tsSource(t); l <- longLit(v)) yield (s, true, l)
      case LessThanOrEqual(t, v)    => for (s <- tsSource(t); l <- longLit(v)) yield (s, false, l)
      case LessThan(t, v)           => for (s <- tsSource(t); l <- longLit(v)) yield (s, false, l)
      case GreaterThanOrEqual(v, t) => for (s <- tsSource(t); l <- longLit(v)) yield (s, false, l)
      case GreaterThan(v, t)        => for (s <- tsSource(t); l <- longLit(v)) yield (s, false, l)
      case LessThanOrEqual(v, t)    => for (s <- tsSource(t); l <- longLit(v)) yield (s, true, l)
      case LessThan(v, t)           => for (s <- tsSource(t); l <- longLit(v)) yield (s, true, l)
      case _ => None
    }

  /** Resolve a named `ts_ms` attribute down to the generator's struct-typed
    * output attribute, following renames and pass-through projections. */
  private def toStructAttr(plan: LogicalPlan, ts: Attribute): Option[Attribute] =
    plan match {
      case Project(pl, pChild) =>
        pl.collectFirst { case al: Alias if al.exprId == ts.exprId => al.child } match {
          case Some(g @ GetStructField(a: AttributeReference, _, _))
            if fieldName(g) == "ts_ms" => Some(a)
          case Some(a2: AttributeReference) => toStructAttr(pChild, a2)
          case Some(_) => None
          case None if pChild.outputSet.contains(ts) => toStructAttr(pChild, ts)
          case None => None
        }
      case Filter(_, fChild) => toStructAttr(fChild, ts)
      case _ => None
    }

  private def stripAlias(e: Expression): Expression = e match {
    case Alias(c, _) => stripAlias(c)
    case o => o
  }

  /** Generator inputs whose output struct's `ts_ms` provably lies inside the
    * frame's stored `[mint, maxt]`: the two chunk decoders (the writer
    * computes the stats from the same samples either encodes), a CaseWhen
    * unioning such branches (the mixed float/histogram read path), and an
    * array transform that passes the decoded `ts_ms` field through
    * unchanged. Anything that could move a timestamp is rejected — pruning
    * must stay sound. */
  private[graft] def framePreserving(e: Expression): Boolean = e match {
    case _: ChunkDecode     => true
    case _: HistChunkDecode => true
    case CaseWhen(branches, elseValue) =>
      (branches.map(_._2) ++ elseValue.toSeq).forall(framePreserving)
    case ArrayTransform(child, LambdaFunction(f, Seq(lv: NamedLambdaVariable), _)) =>
      framePreserving(child) && (stripAlias(f) match {
        case cns: CreateNamedStruct =>
          // `names` are the EVALUATED name values (UTF8String), not Literals
          cns.names.zip(cns.valExprs).exists { case (n, v) =>
            String.valueOf(n) == "ts_ms" && (stripAlias(v) match {
              case g @ GetStructField(lv2: NamedLambdaVariable, _, _) =>
                fieldName(g) == "ts_ms" && lv2.exprId == lv.exprId
              case _ => false
            })
          }
        case _ => false
      })
    case _ => false
  }

  /** Find the Generate whose frame-preserving Explode produces `structAttr`. */
  private def findGenerate(plan: LogicalPlan, structAttr: Attribute): Option[Generate] =
    plan match {
      case g: Generate if g.generatorOutput.exists(_.exprId == structAttr.exprId) =>
        g.generator match {
          case Explode(e) if framePreserving(e) => Some(g)
          case _ => None
        }
      case p: Project =>
        p.projectList.collectFirst {
          case al: Alias if al.exprId == structAttr.exprId => al.child
        } match {
          case Some(a2: AttributeReference) => findGenerate(p.child, a2)
          case Some(_) => None
          case None if p.child.outputSet.contains(structAttr) =>
            findGenerate(p.child, structAttr)
          case None => None
        }
      case Filter(_, fChild) => findGenerate(fChild, structAttr)
      case _ => None
    }

  /** Insert `Filter(maxt≥lo AND mint≤hi)` at the topmost descendant whose
    * output still carries the stat columns — ColumnPruning has usually
    * inserted a Project below the Generate that drops `mint`/`maxt`, so the
    * frame filter goes under it, directly above the scan relation. Returns
    * None when nothing changed (stats missing, or filter already present —
    * the fixpoint guard). */
  private def injectBelow(plan: LogicalPlan, lo: Option[Long],
                          hi: Option[Long]): Option[LogicalPlan] = {
    val mintA = plan.output.find(a => a.name == "mint" && a.dataType == LongType)
    val maxtA = plan.output.find(a => a.name == "maxt" && a.dataType == LongType)
    val preds = (for (l <- lo; a <- maxtA)
        yield GreaterThanOrEqual(a, Literal(l)): Expression).toSeq ++
      (for (h <- hi; a <- mintA)
        yield LessThanOrEqual(a, Literal(h)): Expression).toSeq
    if (preds.nonEmpty) {
      val pred = preds.reduce(And)
      val already = plan match {
        case Filter(c, _) =>
          val have = conjuncts(c)
          conjuncts(pred).forall(p => have.exists(_.semanticEquals(p)))
        case _ => false
      }
      if (already) None else Some(Filter(pred, plan))
    } else plan match {
      case p: Project => injectBelow(p.child, lo, hi).map(nc => p.copy(child = nc))
      case f: Filter  => injectBelow(f.child, lo, hi).map(nc => f.copy(child = nc))
      case _ => None
    }
  }

  private def rewrite(f: Filter, cond: Expression,
                      child: LogicalPlan): Option[LogicalPlan] = {
    val bounds = conjuncts(cond).flatMap(bound)
    if (bounds.isEmpty) return None

    // group bounds by their resolved generator (several sources can name the
    // same generate through different expressions; tightest bound wins)
    val resolved = bounds.flatMap { case (src, isLower, v) =>
      val structAttr = src match {
        case Named(named)      => toStructAttr(child, named)
        case StructOut(direct) => Some(direct)
      }
      structAttr.flatMap(findGenerate(child, _)).map(g => (g, isLower, v))
    }
    if (resolved.isEmpty) return None

    val byGen = resolved.groupBy(_._1)
    var changed = false
    val newChild = child.transformDown {
      case g: Generate if byGen.exists(_._1 eq g) =>
        val bs = byGen.find(_._1 eq g).get._2
        val lo = bs.filter(_._2).map(_._3).reduceOption(_ max _)
        val hi = bs.filterNot(_._2).map(_._3).reduceOption(_ min _)
        injectBelow(g.child, lo, hi) match {
          case Some(nc) => changed = true; g.copy(child = nc)
          case None     => g
        }
    }
    if (changed) Some(f.copy(child = newChild)) else None
  }
}
