package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.{graftshim, Column}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Misra–Gries heavy-hitters sketch (Misra & Gries 1982; mergeable
  * form per Agarwal et al. 2012, "Mergeable Summaries") — the 100 TB answer to
  * "most frequent tokens/n-grams over the corpus" when the exact
  * groupBy-count's key space (full vocabulary) is too wide to shuffle cheaply:
  * at most `capacity` counters per partition, one map-side pass, associative
  * merge, and every item with true frequency > n/(capacity+1) is guaranteed
  * present with count underestimated by at most n/(capacity+1).
  *
  * When `capacity` ≥ the number of distinct items the trim step never fires
  * and counts are EXACT and merge-order-independent — the registry query runs
  * in that regime so the DuckDB oracle can gate it against exact counts; the
  * sketch regime (capacity < distinct) is property-tested in FreqSketchSpec.
  */
final class FreqSketchState(val capacity: Int) {
  val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty

  def add(tok: String, w: Long = 1L): Unit = {
    counts.updateWith(tok) {
      case Some(c) => Some(c + w)
      case None    => Some(w)
    }
    if (counts.size > capacity) trim()
  }

  /** Subtract the (capacity+1)-th largest count from every counter and drop
    * the non-positive ones — the Misra–Gries decrement generalized to
    * weighted updates. Leaves at most `capacity` counters. */
  private def trim(): Unit = {
    if (counts.size <= capacity) return
    val arr = counts.values.toArray
    java.util.Arrays.sort(arr)
    val sub = arr(arr.length - capacity - 1)
    val dead = mutable.ArrayBuffer.empty[String]
    counts.mapValuesInPlace((_, c) => c - sub)
    counts.foreach { case (t, c) => if (c <= 0) dead += t }
    dead.foreach(counts.remove)
  }

  /** Pointwise-add the other sketch's counters, then one trim. */
  def merge(o: FreqSketchState): Unit = {
    o.counts.foreach { case (t, c) =>
      counts.updateWith(t) {
        case Some(x) => Some(x + c)
        case None    => Some(c)
      }
    }
    if (counts.size > capacity) trim()
  }

  def toBytes: Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(capacity)
    out.writeInt(counts.size)
    counts.foreach { case (t, c) => out.writeUTF(t); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }
}

object FreqSketchState {
  def fromBytes(bytes: Array[Byte]): FreqSketchState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val st = new FreqSketchState(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val t = in.readUTF(); val c = in.readLong()
      st.counts.update(t, c)
      i += 1
    }
    st
  }
}

/** `freq_sketch(col, capacity)`: aggregates strings into a serialized
  * Misra–Gries sketch (BinaryType). Partial aggregation builds one sketch per
  * partition; the shuffle moves ≤ capacity counters per partial, not the
  * token stream. */
case class FreqSketchAgg(child: Expression, capacity: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqSketchState] with UnaryLike[Expression] {

  override def createAggregationBuffer(): FreqSketchState = new FreqSketchState(capacity)

  override def update(buffer: FreqSketchState, input: InternalRow): FreqSketchState = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: FreqSketchState, other: FreqSketchState): FreqSketchState = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: FreqSketchState): Any = buffer.toBytes
  override def serialize(buffer: FreqSketchState): Array[Byte] = buffer.toBytes
  override def deserialize(storageFormat: Array[Byte]): FreqSketchState =
    FreqSketchState.fromBytes(storageFormat)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqSketchAgg =
    copy(child = newChild)
  override def prettyName: String = "freq_sketch"
}

object FreqSketchAgg {
  def apply(c: Column, capacity: Int): Column =
    graftshim.toColumn(
      FreqSketchAgg(graftshim.toExpression(c), capacity).toAggregateExpression())
}

/** `freq_sketch_entries(sketch)`: decode a serialized sketch into
  * array<struct<token, est>> sorted by (est desc, token) for deterministic
  * downstream ordering. Evaluated once per group row — not a hot path. */
case class FreqSketchEntries(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("token", StringType, nullable = false),
      StructField("est", LongType, nullable = false))), containsNull = false)

  override protected def nullSafeEval(bytes: Any): Any = {
    val st = FreqSketchState.fromBytes(bytes.asInstanceOf[Array[Byte]])
    val sorted = st.counts.toArray.sortBy { case (t, c) => (-c, t) }
    new GenericArrayData(sorted.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c)
    }.toSeq)
  }

  override protected def withNewChildInternal(newChild: Expression): FreqSketchEntries =
    copy(child = newChild)
  override def prettyName: String = "freq_sketch_entries"
}

object FreqSketchEntries {
  def apply(c: Column): Column =
    graftshim.toColumn(FreqSketchEntries(graftshim.toExpression(c)))
}
