package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Map-side MinHash signature: K min-permutation values computed per row from
  * the hashed-shingle array, in one pass.
  *
  * Replaces the explode→shuffle→K-column `min` aggregation formulation
  * (`explode(hs)` then `groupBy(doc_id).agg(min((a_j*x+b_j)%P)…)`): the
  * signature is a pure function of one row's shingle set, so distributing it
  * through a shuffle is wasted motion — at 100 TB the explode form shuffles
  * ~hundreds of shingles per document where this shuffles nothing.
  *
  * Values are bit-identical to the aggregation form (and to the DuckDB oracle
  * SQL built from the same [[MinHashSig.aCoef]]/[[MinHashSig.bCoef]] LCG
  * constants): `min_j = min over x in hs of (a_j*(x mod P) + b_j) mod P` with
  * P = 2^31−1; hs entries are 48-bit non-negative, so `a*x+b < 2^62` never
  * overflows a long.
  *
  * Empty shingle set → null (the aggregation form emits no row for a document
  * with no shingles; callers filter nulls to match).
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  // null even for non-null children (empty shingle set)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(in: Any): Any =
    MinHashSig.compute(in.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val resultTerm = ctx.freshName("mhs")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $resultTerm =
         |  graft.functions.MinHashSig.compute($c, $k);
         |if ($resultTerm == null) { ${ev.isNull} = true; } else { ${ev.value} = $resultTerm; }
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  /** Mersenne prime 2^31−1: universal-hash modulus. */
  val P: Long = 2147483647L
  def aCoef(j: Int): Long = (1103515245L * (j + 1) + 12345L) % P
  def bCoef(j: Int): Long = (69069L * (j + 1) + 1L) % P

  /** Static entry point shared by eval and generated code; null on empty. */
  def compute(hs: ArrayData, k: Int): ArrayData = {
    val n = hs.numElements()
    if (n == 0) return null
    val as = new Array[Long](k)
    val bs = new Array[Long](k)
    var j = 0
    while (j < k) { as(j) = aCoef(j); bs(j) = bCoef(j); j += 1 }
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val x = hs.getLong(i) % P
      j = 0
      while (j < k) {
        val v = (as(j) * x + bs(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Column-level API: `minhash_sig(hashedShingles, k)`. */
  def apply(hashedShingles: Column, k: Int): Column =
    graftshim.toColumn(MinHashSig(graftshim.toExpression(hashedShingles), k))
}

/** Map-side 48-bit SimHash over a token array (multiplicity-weighted):
  * bit j of the result is set iff Σ_tokens (+1 if bit j of h48(token) else −1)
  * is > 0, where h48 is the first-6-md5-bytes hash ([[WordNGramHashes.h48]]).
  *
  * Replaces the explode→shuffle→48-conditional-`sum` aggregation: like
  * [[MinHashSig]], the sketch is per-row, so it belongs before the shuffle —
  * the pair-join that consumes it then reads one long per document.
  * Bit-identical to the aggregation form and the oracle SQL.
  */
case class SimHash48(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash48"

  override def nullSafeEval(in: Any): Any =
    SimHash48.compute(in.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash48.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash48 {
  /** Static entry point shared by eval and generated code. */
  def compute(toks: ArrayData): Long = {
    val n = toks.numElements()
    val counts = new Array[Int](48)
    var i = 0
    while (i < n) {
      val h = WordNGramHashes.h48(toks.getUTF8String(i).getBytes)
      var j = 0
      while (j < 48) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 48) {
      if (counts(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  /** Column-level API: `simhash48(tokens)`. */
  def apply(tokens: Column): Column =
    graftshim.toColumn(SimHash48(graftshim.toExpression(tokens)))
}
