package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.{graftshim, Column}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Mergeable t-digest quantile sketch (Dunning & Ertl, "Computing extremely
  * accurate quantiles using t-digests") — the documented 100 TB swap for the
  * exact rank-based quantiles in `tx_len_quantiles`/`Aggregations.quantile`:
  * constant memory per group, one map-side pass, associative merge, with the
  * scale-function bound `w ≤ 4·W·q·(1−q)/δ` concentrating centroids at the
  * tails where quantile queries need resolution.
  *
  * The merged state is a sorted centroid list plus an unmerged point buffer;
  * `compress()` folds the buffer in via the classic merging pass. Estimates
  * interpolate between centroid midpoints and clamp to the observed
  * [min, max]. Like any t-digest, results depend slightly on merge order —
  * callers gate on an ε band against the exact quantile, not equality.
  */
final class TDigestState(val compression: Int) {
  private val means = new ArrayBuffer[Double]
  private val weights = new ArrayBuffer[Double]
  private val bufM = new ArrayBuffer[Double]
  private val bufW = new ArrayBuffer[Double]
  var minV: Double = Double.PositiveInfinity
  var maxV: Double = Double.NaN // NaN ⇒ empty
  private var maxSet = false

  def isEmpty: Boolean = means.isEmpty && bufM.isEmpty

  def add(x: Double, w: Double = 1.0): Unit = {
    bufM += x; bufW += w
    if (x < minV) minV = x
    if (!maxSet || x > maxV) { maxV = x; maxSet = true }
    if (bufM.size >= 8 * compression) compress()
  }

  def merge(o: TDigestState): Unit = {
    o.compress()
    var i = 0
    while (i < o.means.size) { bufM += o.means(i); bufW += o.weights(i); i += 1 }
    if (o.maxSet) {
      if (o.minV < minV) minV = o.minV
      if (!maxSet || o.maxV > maxV) { maxV = o.maxV; maxSet = true }
    }
    if (bufM.size >= 8 * compression) compress()
  }

  /** Fold the buffer into the centroid list: sort all (mean, weight) pairs,
    * then greedily merge neighbors while the combined centroid stays within
    * the scale bound at its quantile position. */
  def compress(): Unit = {
    if (bufM.isEmpty) return
    val m = (means ++ bufM).toArray
    val w = (weights ++ bufW).toArray
    means.clear(); weights.clear(); bufM.clear(); bufW.clear()
    val order = m.indices.sortBy(m(_))
    var total = 0.0
    w.foreach(total += _)
    var curM = 0.0; var curW = 0.0; var cumBefore = 0.0
    order.foreach { i =>
      if (curW == 0) { curM = m(i); curW = w(i) }
      else {
        val proposed = curW + w(i)
        val q = (cumBefore + proposed / 2) / total
        val bound = 4.0 * total * q * (1.0 - q) / compression
        if (proposed <= math.max(1.0, bound)) {
          curM += (m(i) - curM) * w(i) / proposed
          curW = proposed
        } else {
          means += curM; weights += curW; cumBefore += curW
          curM = m(i); curW = w(i)
        }
      }
    }
    if (curW > 0) { means += curM; weights += curW }
  }

  def quantile(phi: Double): Double = {
    compress()
    if (means.isEmpty) return Double.NaN
    if (phi.isNaN) return Double.NaN
    val q = math.min(1.0, math.max(0.0, phi))
    var total = 0.0
    weights.foreach(total += _)
    val target = q * total
    if (means.size == 1) return means(0)
    // centroid midpoints on the cumulative-weight axis
    val mids = new Array[Double](means.size)
    var cum = 0.0
    var i = 0
    while (i < means.size) { mids(i) = cum + weights(i) / 2; cum += weights(i); i += 1 }
    if (target <= mids(0))
      return minV + (target / mids(0)) * (means(0) - minV)
    if (target >= mids.last) {
      val den = total - mids.last // = w_last/2 > 0
      return means.last + ((target - mids.last) / den) * (maxV - means.last)
    }
    i = 0
    while (mids(i + 1) < target) i += 1
    means(i) + ((target - mids(i)) / (mids(i + 1) - mids(i))) * (means(i + 1) - means(i))
  }

  def toBytes: Array[Byte] = {
    compress()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(compression)
    out.writeDouble(minV); out.writeDouble(maxV); out.writeBoolean(maxSet)
    out.writeInt(means.size)
    var i = 0
    while (i < means.size) { out.writeDouble(means(i)); out.writeDouble(weights(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }
}

object TDigestState {
  def fromBytes(bytes: Array[Byte]): TDigestState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val st = new TDigestState(in.readInt())
    val mn = in.readDouble(); val mx = in.readDouble(); val ms = in.readBoolean()
    val n = in.readInt()
    var i = 0
    while (i < n) { st.add(in.readDouble(), in.readDouble()); i += 1 }
    // add() tracked min/max from centroid MEANS — restore the true bounds
    if (ms) { st.minV = mn; st.maxV = mx }
    st
  }
}

/** `tdigest_sketch(col, δ)`: aggregates doubles into a serialized t-digest
  * (BinaryType). Imperative like Spark's own `percentile_approx` — sketch
  * construction is inherently stateful; the per-row cost is an append. */
case class TDigestAgg(child: Expression, compression: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigestState] with UnaryLike[Expression] {

  override def createAggregationBuffer(): TDigestState = new TDigestState(compression)

  override def update(buffer: TDigestState, input: InternalRow): TDigestState = {
    val v = child.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      if (!d.isNaN) buffer.add(d)
    }
    buffer
  }

  override def merge(buffer: TDigestState, other: TDigestState): TDigestState = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: TDigestState): Any = buffer.toBytes
  override def serialize(buffer: TDigestState): Array[Byte] = buffer.toBytes
  override def deserialize(storageFormat: Array[Byte]): TDigestState =
    TDigestState.fromBytes(storageFormat)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TDigestAgg =
    copy(child = newChild)
  override def prettyName: String = "tdigest_sketch"
}

object TDigestAgg {
  def apply(c: Column, compression: Int): Column =
    graftshim.toColumn(
      TDigestAgg(graftshim.toExpression(c), compression).toAggregateExpression())
}

/** `tdigest_quantile(digest, φ)`: estimate a quantile from a serialized
  * digest. Scalar, evaluated once per group row — not a hot path. */
case class TDigestQuantile(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(digest: Any, phi: Any): Any =
    TDigestState.fromBytes(digest.asInstanceOf[Array[Byte]])
      .quantile(phi.asInstanceOf[Double])

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): TDigestQuantile =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "tdigest_quantile"
}

object TDigestQuantile {
  def apply(digest: Column, phi: Double): Column =
    graftshim.toColumn(TDigestQuantile(graftshim.toExpression(digest),
      org.apache.spark.sql.catalyst.expressions.Literal(phi)))
}
