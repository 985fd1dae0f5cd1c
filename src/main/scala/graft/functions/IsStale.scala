package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Prometheus staleness-marker test: true iff the double is the exact
  * `StaleNaN` bit pattern `0x7ff0000000000002` (prometheus
  * `pkg/value/value.go`). An ordinary NaN (`0x7ff8…`) is a real sample value
  * and must NOT match — so this is a raw-bits comparison, not `isnan`.
  * Codegen'd: one `doubleToRawLongBits` per row in the scan filter. */
case class IsStale(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "is_stale"

  override def nullSafeEval(in: Any): Any =
    java.lang.Double.doubleToRawLongBits(in.asInstanceOf[Double]) == IsStale.StaleNaNBits

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = java.lang.Double.doubleToRawLongBits($c) == ${IsStale.StaleNaNBits}L;")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object IsStale {
  val StaleNaNBits: Long = 0x7ff0000000000002L
  /** The staleness marker itself (for tests / ingest tooling). */
  val StaleNaN: Double = java.lang.Double.longBitsToDouble(StaleNaNBits)

  /** Column-level API: `is_stale(value)`. */
  def apply(c: Column): Column =
    graftshim.toColumn(IsStale(graftshim.toExpression(c)))
}
