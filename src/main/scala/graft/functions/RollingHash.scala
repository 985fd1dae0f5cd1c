package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Rabin–Karp rolling-hash document fingerprint: the minimum polynomial hash
  * over all sliding `w`-code-point windows of the input string
  * (winnowing-style content fingerprint; BASELINE.json north-star "document
  * fingerprinting (rolling hash)").
  *
  * Window hash: `h = fold(c -> acc*B + c mod P)` over the window's Unicode
  * code points, B = 257, P = 2^31−1. Successive windows are computed with the
  * O(1) Rabin–Karp update `h' = (h − c_out·B^{w−1})·B + c_in mod P`, so the
  * whole document is one O(n) pass — the naive per-window fold is O(n·w).
  * All intermediates stay < 2^39, no overflow. Strings shorter than `w` hash
  * as a single window over all their code points; the empty string maps to 0.
  *
  * The min-window value is shift-local: editing one region of a document
  * perturbs only the windows crossing the edit, so near-identical documents
  * usually keep the same fingerprint — unlike a whole-document digest
  * (`tx_fingerprint`'s md5), which flips on any edit.
  */
case class RollingFingerprint(child: Expression, w: Int) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_fingerprint"

  override def nullSafeEval(in: Any): Any =
    RollingFingerprint.compute(in.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RollingFingerprint.compute($c, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingFingerprint {
  val P: Long = 2147483647L // Mersenne prime 2^31−1
  val B: Long = 257L

  /** Static entry point shared by eval and generated code. */
  def compute(s: UTF8String, w: Int): Long = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    if (n == 0) return 0L
    // seed hash over the first min(n, w) code points
    val head = math.min(n, w)
    var h = 0L
    var i = 0
    while (i < head) { h = (h * B + cps(i)) % P; i += 1 }
    if (n <= w) return h
    // B^(w-1) mod P, for evicting the outgoing code point
    var powW1 = 1L
    var j = 1
    while (j < w) { powW1 = (powW1 * B) % P; j += 1 }
    var min = h
    i = w
    while (i < n) {
      val out = (cps(i - w) * powW1) % P
      h = ((h + P - out) % P * B + cps(i)) % P
      if (h < min) min = h
      i += 1
    }
    min
  }

  /** Column-level API: `rolling_fingerprint(str, w)`. */
  def apply(str: Column, w: Int): Column =
    graftshim.toColumn(RollingFingerprint(graftshim.toExpression(str), w))
}
