package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native-histogram chunk codec for the chunked layout — the analog of the
  * reference's histogram chunk encodings riding next to XOR chunks
  * (`api/grpc/thanos.go:462-473` maps chunkenc.EncHistogram /
  * EncFloatHistogram; framing `convert/chunks.go:56-61`). One frame row per
  * (series, 8h window) holds the encoded (ts, value, histogram) triples.
  *
  * Layout per chunk (single bit stream, sequential decode):
  *
  *  - sample count (32 bits);
  *  - per sample: timestamp as Gorilla delta-of-delta (same bucket widths as
  *    [[GorillaChunk]]); then `value`, `cnt`, `hsum`, `zcnt`, `zthr` each as
  *    a self-contained XOR-vs-previous field ('0' = identical bits, else
  *    '1' + 5-bit leading + 6-bit significant-length + bits — raw-bit XOR,
  *    so every IEEE payload including NaN/-0.0 survives byte-exactly);
  *    `sch` as a same-as-previous flag else raw 32 bits; then the `pos` and
  *    `neg` sparse bucket arrays — 16-bit length, bucket indexes
  *    delta-encoded (zigzag, 7-bit short form / 32-bit escape), bucket
  *    counts XOR'd against the previous bucket's count in the same array.
  *
  * Slowly-varying cumulative histograms (the common case: scrape-to-scrape
  * the schema, zero threshold and most bucket sets repeat) come out at a
  * few bits per unchanged field. No window-state carry across fields keeps
  * the codec auditable; compression is within ~2× of the Prometheus chunk
  * layout on regular series, which the 8h framing already amortizes.
  *
  * A chunk is either all-histogram or not written at all: a null histogram
  * among the points fails loudly (a mixed float/histogram series is a data
  * error, matching the reference's per-chunk encoding tag).
  */
object HistChunk {

  /** The pinned histogram struct model ([[graft.promql.NativeHistograms]]). */
  val BucketType: StructType = StructType(Seq(
    StructField("idx", IntegerType, nullable = false),
    StructField("c", DoubleType, nullable = false)))
  val HistType: StructType = StructType(Seq(
    StructField("cnt", DoubleType),
    StructField("hsum", DoubleType),
    StructField("sch", IntegerType),
    StructField("zthr", DoubleType),
    StructField("zcnt", DoubleType),
    StructField("pos", ArrayType(BucketType, containsNull = false)),
    StructField("neg", ArrayType(BucketType, containsNull = false)),
    // custom bucket bounds (NHCB, schema -53): upper bound per positive
    // bucket index, ascending; null for standard exponential schemas
    StructField("cb", ArrayType(DoubleType, containsNull = false))))
  /** Number of fields in [[HistType]] (the InternalRow accessor arity). */
  val HistArity: Int = HistType.length
  val PointType: StructType = StructType(Seq(
    StructField("ts_ms", LongType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("h", HistType)))

  // ------------------------------------------------------------ bit streams
  private final class BitWriter {
    private var buf = new Array[Byte](128)
    private var bitPos = 0
    private def ensure(bits: Int): Unit = {
      val needBytes = (bitPos + bits + 7) >>> 3
      if (needBytes > buf.length) {
        val n = new Array[Byte](math.max(buf.length * 2, needBytes))
        System.arraycopy(buf, 0, n, 0, buf.length)
        buf = n
      }
    }
    def write(v: Long, n: Int): Unit = {
      ensure(n)
      var i = n - 1
      while (i >= 0) {
        if (((v >>> i) & 1L) != 0L)
          buf((bitPos >>> 3)) = (buf(bitPos >>> 3) | (0x80 >>> (bitPos & 7))).toByte
        bitPos += 1
        i -= 1
      }
    }
    def toBytes: Array[Byte] = java.util.Arrays.copyOf(buf, (bitPos + 7) >>> 3)
  }

  private final class BitReader(bytes: Array[Byte]) {
    private var bitPos = 0
    def read(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) {
        v = (v << 1) | ((bytes(bitPos >>> 3) >>> (7 - (bitPos & 7))) & 1L)
        bitPos += 1
        i += 1
      }
      v
    }
    def readSigned(n: Int): Long = {
      val v = read(n)
      (v << (64 - n)) >> (64 - n)
    }
  }

  /** Self-contained XOR field: no carried leading/length window, so each
    * field decodes independently of its neighbours' histories. */
  private def writeXor(w: BitWriter, bits: Long, prev: Long): Unit = {
    val x = bits ^ prev
    if (x == 0L) w.write(0L, 1)
    else {
      w.write(1L, 1)
      val lead = math.min(java.lang.Long.numberOfLeadingZeros(x), 31)
      val trail = java.lang.Long.numberOfTrailingZeros(x)
      val sig = 64 - lead - trail
      w.write(lead.toLong, 5)
      w.write(sig.toLong & 0x3FL, 6) // 64 encodes as 0
      w.write(x >>> trail, sig)
    }
  }

  private def readXor(r: BitReader, prev: Long): Long =
    if (r.read(1) == 0L) prev
    else {
      val lead = r.read(5).toInt
      val s = r.read(6).toInt
      val sig = if (s == 0) 64 else s
      prev ^ (r.read(sig) << (64 - lead - sig))
    }

  private def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)
  private def unzigzag(v: Long): Long = (v >>> 1) ^ -(v & 1L)

  /** Bucket index delta: '0' + 7 zigzag bits for the near-universal small
    * step, '1' + 32 zigzag bits otherwise. */
  private def writeIdxDelta(w: BitWriter, d: Long): Unit = {
    val zz = zigzag(d)
    if (zz < 128L) { w.write(0L, 1); w.write(zz, 7) }
    else { w.write(1L, 1); w.write(zz & 0xFFFFFFFFL, 32) }
  }

  private def readIdxDelta(r: BitReader): Long =
    if (r.read(1) == 0L) unzigzag(r.read(7)) else unzigzag(r.read(32))

  private def writeBuckets(w: BitWriter, arr: ArrayData): Unit = {
    val n = if (arr == null) 0 else arr.numElements()
    require(n < 65536, s"histogram bucket array too large: $n")
    w.write(n.toLong, 16)
    var prevIdx = 0L
    var prevC = 0L
    var i = 0
    while (i < n) {
      val b = arr.getStruct(i, 2)
      val idx = b.getInt(0).toLong
      writeIdxDelta(w, idx - prevIdx)
      val cBits = java.lang.Double.doubleToRawLongBits(b.getDouble(1))
      writeXor(w, cBits, prevC)
      prevIdx = idx
      prevC = cBits
      i += 1
    }
  }

  private def readBuckets(r: BitReader): ArrayData = {
    val n = r.read(16).toInt
    val out = new Array[Any](n)
    var prevIdx = 0L
    var prevC = 0L
    var i = 0
    while (i < n) {
      prevIdx += readIdxDelta(r)
      prevC = readXor(r, prevC)
      out(i) = InternalRow(prevIdx.toInt, java.lang.Double.longBitsToDouble(prevC))
      i += 1
    }
    new GenericArrayData(out)
  }

  // ------------------------------------------------------------------ encode
  /** points: array<struct<ts_ms, value, h>> sorted by ts; every h non-null. */
  def encode(points: ArrayData): Array[Byte] = {
    val n = points.numElements()
    val w = new BitWriter
    w.write(n.toLong, 32)
    var prevTs = 0L; var prevDelta = 0L
    var pv = 0L; var pCnt = 0L; var pSum = 0L; var pZc = 0L; var pZt = 0L
    var pSch = Int.MinValue
    var pCb: Array[Long] = new Array[Long](0); var pCbN = 0
    var i = 0
    while (i < n) {
      val p = points.getStruct(i, 3)
      require(!p.isNullAt(2),
        "histogram chunk encode: null histogram among the points — a series " +
          "must be all-histogram or all-float within a frame")
      val ts = p.getLong(0)
      if (i == 0) { w.write(ts, 64); prevTs = ts }
      else {
        val delta = ts - prevTs
        val dod = delta - prevDelta
        if (dod == 0L) w.write(0L, 1)
        else if (dod >= -8192L && dod <= 8191L) { w.write(2L, 2); w.write(dod & 0x3FFFL, 14) }
        else if (dod >= -65536L && dod <= 65535L) { w.write(6L, 3); w.write(dod & 0x1FFFFL, 17) }
        else if (dod >= -524288L && dod <= 524287L) { w.write(14L, 4); w.write(dod & 0xFFFFFL, 20) }
        else { w.write(15L, 4); w.write(dod, 64) }
        prevDelta = delta; prevTs = ts
      }
      val vBits = java.lang.Double.doubleToRawLongBits(p.getDouble(1))
      writeXor(w, vBits, pv); pv = vBits
      val h = p.getStruct(2, HistChunk.HistArity)
      val cnt = java.lang.Double.doubleToRawLongBits(h.getDouble(0))
      val hsum = java.lang.Double.doubleToRawLongBits(h.getDouble(1))
      val sch = h.getInt(2)
      val zthr = java.lang.Double.doubleToRawLongBits(h.getDouble(3))
      val zcnt = java.lang.Double.doubleToRawLongBits(h.getDouble(4))
      writeXor(w, cnt, pCnt); pCnt = cnt
      writeXor(w, hsum, pSum); pSum = hsum
      writeXor(w, zcnt, pZc); pZc = zcnt
      writeXor(w, zthr, pZt); pZt = zthr
      if (sch == pSch) w.write(0L, 1)
      else { w.write(1L, 1); w.write(sch.toLong & 0xFFFFFFFFL, 32); pSch = sch }
      writeBuckets(w, h.getArray(5))
      writeBuckets(w, h.getArray(6))
      // custom bounds (NHCB): '0' = same as previous sample (the universal
      // scrape-to-scrape case — bounds are layout), else '1' + u16 count +
      // raw f64 bounds; null ≡ empty
      val cb = if (h.isNullAt(7)) null else h.getArray(7)
      val cbN = if (cb == null) 0 else cb.numElements()
      val same = i > 0 && cbN == pCbN && {
        var k = 0; var eq = true
        while (eq && k < cbN) {
          eq = java.lang.Double.doubleToRawLongBits(cb.getDouble(k)) == pCb(k)
          k += 1
        }
        eq
      }
      if (same) w.write(0L, 1)
      else {
        w.write(1L, 1)
        require(cbN < 65536, s"custom-bounds array too large: $cbN")
        w.write(cbN.toLong, 16)
        pCb = new Array[Long](cbN)
        var k = 0
        while (k < cbN) {
          pCb(k) = java.lang.Double.doubleToRawLongBits(cb.getDouble(k))
          w.write(pCb(k), 64)
          k += 1
        }
        pCbN = cbN
      }
      i += 1
    }
    w.toBytes
  }

  // ------------------------------------------------------------------ decode
  def decode(bytes: Array[Byte]): ArrayData = {
    val r = new BitReader(bytes)
    val n = r.read(32).toInt
    val out = new Array[Any](n)
    var ts = 0L; var delta = 0L
    var pv = 0L; var pCnt = 0L; var pSum = 0L; var pZc = 0L; var pZt = 0L
    var pSch = 0
    var pCbArr: ArrayData = null
    var i = 0
    while (i < n) {
      if (i == 0) ts = r.read(64)
      else {
        val dod =
          if (r.read(1) == 0L) 0L
          else if (r.read(1) == 0L) r.readSigned(14)
          else if (r.read(1) == 0L) r.readSigned(17)
          else if (r.read(1) == 0L) r.readSigned(20)
          else r.read(64)
        delta += dod
        ts += delta
      }
      pv = readXor(r, pv)
      pCnt = readXor(r, pCnt)
      pSum = readXor(r, pSum)
      pZc = readXor(r, pZc)
      pZt = readXor(r, pZt)
      if (r.read(1) == 1L) pSch = r.read(32).toInt
      val pos = readBuckets(r)
      val neg = readBuckets(r)
      if (r.read(1) == 1L) {
        val m = r.read(16).toInt
        pCbArr =
          if (m == 0) null
          else {
            val vals = new Array[Any](m)
            var k = 0
            while (k < m) { vals(k) = java.lang.Double.longBitsToDouble(r.read(64)); k += 1 }
            new GenericArrayData(vals)
          }
      }
      val h = InternalRow(
        java.lang.Double.longBitsToDouble(pCnt),
        java.lang.Double.longBitsToDouble(pSum),
        pSch,
        java.lang.Double.longBitsToDouble(pZt),
        java.lang.Double.longBitsToDouble(pZc),
        pos, neg, pCbArr)
      out(i) = InternalRow(ts, java.lang.Double.longBitsToDouble(pv), h)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** array<struct<ts_ms,value,h>> (ts-sorted, all-histogram) → chunk bytes. */
case class HistChunkEncode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hist_chunk_encode"
  override def nullSafeEval(in: Any): Any =
    HistChunk.encode(in.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HistChunk.encode($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HistChunkEncode {
  def apply(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftshim
    graftshim.toColumn(HistChunkEncode(graftshim.toExpression(c)))
  }
}

/** chunk bytes → array<struct<ts_ms,value,h>>. */
case class HistChunkDecode(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(HistChunk.PointType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hist_chunk_decode"
  override def nullSafeEval(in: Any): Any =
    HistChunk.decode(in.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HistChunk.decode($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HistChunkDecode {
  def apply(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftshim
    graftshim.toColumn(HistChunkDecode(graftshim.toExpression(c)))
  }
}
