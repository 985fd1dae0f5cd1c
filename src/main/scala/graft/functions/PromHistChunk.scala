package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** Byte-level Prometheus native-histogram chunk codecs — `chunkenc.
  * EncHistogram` (2, integer counts) and `chunkenc.EncFloatHistogram` (3,
  * float counts) — the two encodings the reference frames beside XOR chunks
  * in its chunk-column cells (ref `api/grpc/thanos.go:462-473`; framing
  * `convert/chunks.go:56-61`). The formats are public: Prometheus
  * `tsdb/chunkenc/histogram.go` / `floathistogram.go` / `varbit.go`.
  *
  * Chunk layout (both encodings):
  *
  *   - bytes[0:2]  big-endian uint16 sample count;
  *   - byte[2]     counter-reset header in the top 2 bits (00 unknown,
  *                 01 not-reset, 10 reset, 11 gauge), rest zero;
  *   - bit stream from byte 3:
  *     - layout: zero threshold (1 byte for 0 or powers of two 2⁻²⁴³..2¹⁰ as
  *       exponent+243, else 0xFF + raw f64), schema as varbit int, then the
  *       positive and negative span lists (varbit uint count; per span varbit
  *       uint length then varbit int offset — offsets accumulate a running
  *       bucket index);
  *     - sample 0: t varbit int; then for enc 2 count/zeroCount as varbit
  *       uints, sum as raw f64, and each bucket's SPATIAL delta (value minus
  *       the previous bucket in layout order) as varbit int — the upstream
  *       in-memory form; for enc 3 count/zeroCount/sum and each ABSOLUTE
  *       bucket as raw f64;
  *     - samples ≥1: t as delta-of-delta varbit int (initial delta 0); enc 2
  *       follows with count/zeroCount dods (varbit int), the sum as a
  *       Gorilla XOR write against a chunk-wide leading/trailing window, and
  *       per-bucket dods of the spatial deltas; enc 3 XOR-writes count,
  *       zeroCount, sum and every bucket, each field carrying its own
  *       leading/trailing window.
  *
  * varbit ints use Prometheus' asymmetric buckets (prefix 0 / 10+3 / 110+6 /
  * 1110+9 / 11110+12 / 111110+18 / 1111110+25 / 11111110+56 / 11111111+64,
  * where an n-bit field holds [−(2ⁿ⁻¹−1), 2ⁿ⁻¹]); varbit uints use the same
  * prefixes with plain unsigned fields.
  *
  * Mapping to the engine's pinned model ([[HistChunk.HistType]], absolute
  * `{idx, c}` buckets): a chunk's span layout is the UNION of the bucket
  * sets of its samples — exactly the post-recoding state the upstream
  * appender converges to when later samples add buckets — with absent
  * buckets encoded as zero counts; decode drops zero-count buckets again
  * (semantically the identical histogram, and the engine's canonical form).
  * Custom-bound (NHCB) schema −53 carries its bounds array in the model's
  * `cb` field; on disk the bounds follow the span lists (upstream
  * `writeHistogramChunkLayout` / `readHistogramChunkLayout` with
  * [[putCustomBound]]'s doubled-integer varbit scheme).
  */
object PromHistChunk {

  // counter-reset header byte values (top 2 bits of chunk byte 2)
  val UnknownCounterReset = 0x00
  val NotCounterReset = 0x40
  val CounterReset = 0x80
  val GaugeType = 0xC0

  private[functions] val CustomBucketsSchema = -53

  // ------------------------------------------------- custom bounds (NHCB)
  /** Upstream `putCustomBound` (prometheus tsdb/chunkenc/histogram_meta.go):
    * a bound whose doubled value is a non-negative integer ≤ 33554430
    * (2²⁵ − 2, so it always fits the ≤25-bit varbit-uint buckets) stores as
    * varbit uint of `bound * 2`; anything else stores as the 8-ones varbit
    * prefix followed by the raw 64 float bits — the reader disambiguates on
    * the prefix depth alone. */
  private[functions] def putCustomBound(w: PromXorChunk.BitWriter, f: Double): Unit = {
    val tf = f * 2
    if (tf < 0 || tf > 33554430 || tf != Math.rint(tf) || tf.isNaN) {
      w.writeBits(0xFFL, 8)
      w.writeBits(java.lang.Double.doubleToRawLongBits(f), 64)
    } else putVarbitUint(w, tf.toLong)
  }

  private[functions] def readCustomBound(r: PromXorChunk.BitReader): Double = {
    var d = 0
    while (d < 8 && r.readBits(1) == 1L) d += 1
    d match {
      case 0 => 0.0
      case 1 => r.readBits(3) / 2.0
      case 2 => r.readBits(6) / 2.0
      case 3 => r.readBits(9) / 2.0
      case 4 => r.readBits(12) / 2.0
      case 5 => r.readBits(18) / 2.0
      case 6 => r.readBits(25) / 2.0
      case 7 => r.readBits(56) / 2.0
      case _ => java.lang.Double.longBitsToDouble(r.readBits(64))
    }
  }

  // --------------------------------------------------------------- varbit
  private[functions] def putVarbitInt(w: PromXorChunk.BitWriter, v: Long): Unit = {
    if (v == 0L) w.writeBits(0L, 1)
    else if (PromXorChunk.bitRange(v, 3)) { w.writeBits(0x2L, 2); w.writeBits(v & 0x7L, 3) }
    else if (PromXorChunk.bitRange(v, 6)) { w.writeBits(0x6L, 3); w.writeBits(v & 0x3FL, 6) }
    else if (PromXorChunk.bitRange(v, 9)) { w.writeBits(0xEL, 4); w.writeBits(v & 0x1FFL, 9) }
    else if (PromXorChunk.bitRange(v, 12)) { w.writeBits(0x1EL, 5); w.writeBits(v & 0xFFFL, 12) }
    else if (PromXorChunk.bitRange(v, 18)) { w.writeBits(0x3EL, 6); w.writeBits(v & 0x3FFFFL, 18) }
    else if (PromXorChunk.bitRange(v, 25)) { w.writeBits(0x7EL, 7); w.writeBits(v & 0x1FFFFFFL, 25) }
    else if (PromXorChunk.bitRange(v, 56)) { w.writeBits(0xFEL, 8); w.writeBits(v & 0xFFFFFFFFFFFFFFL, 56) }
    else { w.writeBits(0xFFL, 8); w.writeBits(v, 64) }
  }

  private[functions] def readVarbitInt(r: PromXorChunk.BitReader): Long = {
    var d = 0
    while (d < 8 && r.readBits(1) == 1L) d += 1
    val sz = d match {
      case 0 => 0
      case 1 => 3
      case 2 => 6
      case 3 => 9
      case 4 => 12
      case 5 => 18
      case 6 => 25
      case 7 => 56
      case _ => 64
    }
    if (sz == 0) 0L
    else if (sz == 64) r.readBits(64)
    else {
      var v = r.readBits(sz)
      if (v > (1L << (sz - 1))) v -= (1L << sz) // asymmetric bucket
      v
    }
  }

  private[functions] def putVarbitUint(w: PromXorChunk.BitWriter, v: Long): Unit = {
    if (v == 0L) w.writeBits(0L, 1)
    else if (ultLess(v, 1L << 3)) { w.writeBits(0x2L, 2); w.writeBits(v, 3) }
    else if (ultLess(v, 1L << 6)) { w.writeBits(0x6L, 3); w.writeBits(v, 6) }
    else if (ultLess(v, 1L << 9)) { w.writeBits(0xEL, 4); w.writeBits(v, 9) }
    else if (ultLess(v, 1L << 12)) { w.writeBits(0x1EL, 5); w.writeBits(v, 12) }
    else if (ultLess(v, 1L << 18)) { w.writeBits(0x3EL, 6); w.writeBits(v, 18) }
    else if (ultLess(v, 1L << 25)) { w.writeBits(0x7EL, 7); w.writeBits(v, 25) }
    else if (ultLess(v, 1L << 56)) { w.writeBits(0xFEL, 8); w.writeBits(v, 56) }
    else { w.writeBits(0xFFL, 8); w.writeBits(v, 64) }
  }

  private def ultLess(a: Long, b: Long): Boolean =
    java.lang.Long.compareUnsigned(a, b) < 0

  private[functions] def readVarbitUint(r: PromXorChunk.BitReader): Long = {
    var d = 0
    while (d < 8 && r.readBits(1) == 1L) d += 1
    d match {
      case 0 => 0L
      case 1 => r.readBits(3)
      case 2 => r.readBits(6)
      case 3 => r.readBits(9)
      case 4 => r.readBits(12)
      case 5 => r.readBits(18)
      case 6 => r.readBits(25)
      case 7 => r.readBits(56)
      case _ => r.readBits(64)
    }
  }

  // ------------------------------------------------------- zero threshold
  private[functions] def putZeroThreshold(w: PromXorChunk.BitWriter, thr: Double): Unit = {
    if (thr == 0.0) { w.writeBits(0L, 8); return }
    // power of two 2^k with -243 <= k <= 10 stores as one byte k+244
    // (frexp exponent k+1 shifted by +243, upstream putZeroThreshold)
    val bits = java.lang.Double.doubleToRawLongBits(thr)
    val isPow2 = thr > 0.0 && (bits & 0x000FFFFFFFFFFFFFL) == 0L &&
      ((bits >>> 52) & 0x7FF) != 0L // normal, mantissa zero
    val k = Math.getExponent(thr)
    if (isPow2 && k >= -243 && k <= 10) w.writeBits((k + 244).toLong, 8)
    else { w.writeBits(0xFFL, 8); w.writeBits(bits, 64) }
  }

  private[functions] def readZeroThreshold(r: PromXorChunk.BitReader): Double = {
    val b = r.readBits(8).toInt
    if (b == 0) 0.0
    else if (b == 0xFF) java.lang.Double.longBitsToDouble(r.readBits(64))
    else Math.scalb(1.0, b - 244) // byte = frexp exp + 243 = k + 244
  }

  // ------------------------------------------------------------- spans
  /** Sorted distinct bucket indexes → the upstream span list (varbit uint
    * count; per span varbit uint length, varbit int offset; offsets
    * accumulate a running index). */
  private def putSpans(w: PromXorChunk.BitWriter, idxs: Array[Int]): Unit = {
    var nSpans = 0
    var i = 0
    while (i < idxs.length) {
      var j = i + 1
      while (j < idxs.length && idxs(j) == idxs(j - 1) + 1) j += 1
      nSpans += 1; i = j
    }
    putVarbitUint(w, nSpans.toLong)
    var cur = 0
    i = 0
    while (i < idxs.length) {
      var j = i + 1
      while (j < idxs.length && idxs(j) == idxs(j - 1) + 1) j += 1
      putVarbitUint(w, (j - i).toLong)
      putVarbitInt(w, (idxs(i) - cur).toLong)
      cur = idxs(i) + (j - i)
      i = j
    }
  }

  /** Upper bound on buckets per histogram chunk: far above anything a real
    * native histogram carries (sparse schemas top out at a few hundred
    * buckets), small enough that a corrupt span-length field fails cleanly
    * instead of materializing a multi-GB bucket array. */
  private val MaxBuckets = 1 << 16

  private def readSpans(r: PromXorChunk.BitReader): Array[Int] = {
    val nSpans = readVarbitUint(r).toInt
    val buf = new scala.collection.mutable.ArrayBuffer[Int]()
    var cur = 0
    var s = 0
    while (s < nSpans) {
      val len = readVarbitUint(r).toInt
      cur += readVarbitInt(r).toInt
      if (len < 0 || buf.size + len > MaxBuckets)
        throw new IllegalArgumentException(
          s"corrupt histogram chunk: span claims $len buckets " +
            s"(${buf.size} so far, cap $MaxBuckets)")
      var k = 0
      while (k < len) { buf += cur; cur += 1; k += 1 }
      s += 1
    }
    buf.toArray
  }

  // ----------------------------------------------------- model extraction
  // h struct fields: 0 cnt, 1 hsum, 2 sch, 3 zthr, 4 zcnt, 5 pos, 6 neg
  private def unionIdxs(points: ArrayData, from: Int, until: Int, f: Int): Array[Int] = {
    val set = new java.util.TreeSet[Integer]()
    var i = from
    while (i < until) {
      val a = points.getStruct(i, 3).getStruct(2, graft.functions.HistChunk.HistArity).getArray(f)
      if (a != null) {
        var k = 0
        while (k < a.numElements()) { set.add(a.getStruct(k, 2).getInt(0)); k += 1 }
      }
      i += 1
    }
    val out = new Array[Int](set.size())
    val it = set.iterator(); var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    out
  }

  /** Absolute counts of sample `h`'s bucket array `f` over the union
    * layout `idxs` (absent buckets 0). */
  private def absCounts(h: InternalRow, f: Int, idxs: Array[Int]): Array[Double] = {
    val out = new Array[Double](idxs.length)
    val a = h.getArray(f)
    if (a != null) {
      var k = 0
      while (k < a.numElements()) {
        val b = a.getStruct(k, 2)
        val pos = java.util.Arrays.binarySearch(idxs, b.getInt(0))
        if (pos >= 0) out(pos) = b.getDouble(1)
        k += 1
      }
    }
    out
  }

  /** schema, zero threshold and (for NHCB) the custom-bounds array must be
    * chunk-constant upstream — a change cuts a new chunk (recoding covers
    * only bucket-set growth). */
  private[functions] def sameLayoutKnobs(a: InternalRow, b: InternalRow): Boolean =
    a.getInt(2) == b.getInt(2) &&
      java.lang.Double.doubleToRawLongBits(a.getDouble(3)) ==
        java.lang.Double.doubleToRawLongBits(b.getDouble(3)) && {
      val ca = if (a.isNullAt(7)) null else a.getArray(7)
      val cb = if (b.isNullAt(7)) null else b.getArray(7)
      val na = if (ca == null) 0 else ca.numElements()
      val nb = if (cb == null) 0 else cb.numElements()
      na == nb && {
        var k = 0; var eq = true
        while (eq && k < na) {
          eq = java.lang.Double.doubleToRawLongBits(ca.getDouble(k)) ==
            java.lang.Double.doubleToRawLongBits(cb.getDouble(k))
          k += 1
        }
        eq
      }
    }

  /** Counter reset between consecutive samples: total, zero-bucket or any
    * regular bucket count decreasing (absent = 0), as upstream appendable. */
  private[functions] def isCounterReset(a: InternalRow, b: InternalRow): Boolean = {
    if (b.getDouble(0) < a.getDouble(0)) return true
    if (b.getDouble(4) < a.getDouble(4)) return true
    var f = 5
    while (f <= 6) {
      val pa = a.getArray(f)
      if (pa != null && pa.numElements() > 0) {
        val pb = b.getArray(f)
        val m = new java.util.HashMap[Integer, java.lang.Double]()
        if (pb != null) {
          var k = 0
          while (k < pb.numElements()) {
            val s = pb.getStruct(k, 2); m.put(s.getInt(0), s.getDouble(1)); k += 1
          }
        }
        var k = 0
        while (k < pa.numElements()) {
          val s = pa.getStruct(k, 2)
          val cur = m.get(s.getInt(0))
          if ((if (cur == null) 0.0 else cur.doubleValue()) < s.getDouble(1)) return true
          k += 1
        }
      }
      f += 1
    }
    false
  }

  private def integral(d: Double): Boolean =
    !d.isNaN && !d.isInfinite && d == Math.rint(d) && Math.abs(d) < 9.007199254740992e15

  /** True when every count in the sample is an integer — the upstream
    * integer-vs-float histogram distinction, inferred from the values (the
    * model is all-double); a change between consecutive samples cuts a
    * chunk like the upstream sample-type change does. */
  private[functions] def sampleIntegral(h: InternalRow): Boolean = {
    if (!integral(h.getDouble(0)) || !integral(h.getDouble(4))) return false
    var f = 5
    while (f <= 6) {
      val a = h.getArray(f)
      if (a != null) {
        var k = 0
        while (k < a.numElements()) {
          if (!integral(a.getStruct(k, 2).getDouble(1))) return false
          k += 1
        }
      }
      f += 1
    }
    true
  }

  /** True when every count in the run is a non-negative integer — the run
    * encodes as an integer histogram chunk (enc 2), else float (enc 3). */
  private[functions] def allIntegral(points: ArrayData, from: Int, until: Int): Boolean = {
    var i = from
    while (i < until) {
      if (!sampleIntegral(points.getStruct(i, 3).getStruct(2, graft.functions.HistChunk.HistArity))) return false
      i += 1
    }
    true
  }

  // -------------------------------------------------------------- encode
  /** Encode points[from, until) (ts-sorted, every h non-null, layout knobs
    * chunk-constant, no counter reset inside) as one Prometheus histogram
    * chunk; `header` is the counter-reset header byte value. */
  def encodeChunk(points: ArrayData, from: Int, until: Int,
                  header: Int, float: Boolean): Array[Byte] = {
    val n = until - from
    require(n >= 1 && n <= 0xFFFF, s"histogram chunk sample count $n out of uint16")
    val h0 = points.getStruct(from, 3).getStruct(2, graft.functions.HistChunk.HistArity)
    val sch = h0.getInt(2)
    val posIdx = unionIdxs(points, from, until, 5)
    val negIdx = unionIdxs(points, from, until, 6)
    val mP = posIdx.length; val mN = negIdx.length

    val w = new PromXorChunk.BitWriter(64 + n * 8)
    w.writeBits(n.toLong, 16)
    w.writeBits((header & 0xC0).toLong, 8)
    putZeroThreshold(w, h0.getDouble(3))
    putVarbitInt(w, sch.toLong)
    putSpans(w, posIdx)
    putSpans(w, negIdx)
    // custom-bucket layout (NHCB, schema -53): the bounds array follows the
    // span lists (upstream writeHistogramChunkLayout); it is layout — a
    // change cuts a chunk (sameLayoutKnobs), so one copy per chunk
    if (sch == CustomBucketsSchema) {
      require(!h0.isNullAt(7),
        "NHCB histogram (schema -53) carries no custom-bounds array")
      val cb = h0.getArray(7)
      putVarbitUint(w, cb.numElements().toLong)
      var k = 0
      while (k < cb.numElements()) { putCustomBound(w, cb.getDouble(k)); k += 1 }
    }

    // per-field encoder state
    var prevT = 0L; var tDelta = 0L
    var prevCnt = 0L; var cntDelta = 0L
    var prevZcnt = 0L; var zcntDelta = 0L
    var sumBits = 0L; var sumLead = 0xFF; var sumTrail = 0
    // enc 2: spatial-delta values + their time deltas; enc 3: raw bits + windows
    val iPosVal = new Array[Long](mP); val iPosDelta = new Array[Long](mP)
    val iNegVal = new Array[Long](mN); val iNegDelta = new Array[Long](mN)
    val fBits = new Array[Long](3 + mP + mN) // cnt, zcnt, sum, pos..., neg...
    val fLead = Array.fill(3 + mP + mN)(0xFF)
    val fTrail = new Array[Int](3 + mP + mN)

    var i = from
    while (i < until) {
      val p = points.getStruct(i, 3)
      val t = p.getLong(0)
      val h = p.getStruct(2, graft.functions.HistChunk.HistArity)
      val cnt = h.getDouble(0); val sum = h.getDouble(1); val zcnt = h.getDouble(4)
      val pAbs = absCounts(h, 5, posIdx)
      val nAbs = absCounts(h, 6, negIdx)
      if (i == from) {
        putVarbitInt(w, t)
        if (!float) {
          putVarbitUint(w, cnt.toLong)
          putVarbitUint(w, zcnt.toLong)
          w.writeBits(java.lang.Double.doubleToRawLongBits(sum), 64)
          var k = 0; var run = 0L
          while (k < mP) {
            val v = pAbs(k).toLong - run
            putVarbitInt(w, v); iPosVal(k) = v; run = pAbs(k).toLong; k += 1
          }
          k = 0; run = 0L
          while (k < mN) {
            val v = nAbs(k).toLong - run
            putVarbitInt(w, v); iNegVal(k) = v; run = nAbs(k).toLong; k += 1
          }
          prevCnt = cnt.toLong; prevZcnt = zcnt.toLong
          sumBits = java.lang.Double.doubleToRawLongBits(sum)
        } else {
          fBits(0) = java.lang.Double.doubleToRawLongBits(cnt)
          fBits(1) = java.lang.Double.doubleToRawLongBits(zcnt)
          fBits(2) = java.lang.Double.doubleToRawLongBits(sum)
          w.writeBits(fBits(0), 64); w.writeBits(fBits(1), 64); w.writeBits(fBits(2), 64)
          var k = 0
          while (k < mP) {
            fBits(3 + k) = java.lang.Double.doubleToRawLongBits(pAbs(k))
            w.writeBits(fBits(3 + k), 64); k += 1
          }
          k = 0
          while (k < mN) {
            fBits(3 + mP + k) = java.lang.Double.doubleToRawLongBits(nAbs(k))
            w.writeBits(fBits(3 + mP + k), 64); k += 1
          }
        }
        prevT = t
      } else {
        val d = t - prevT
        putVarbitInt(w, d - tDelta)
        tDelta = d; prevT = t
        if (!float) {
          val cd = cnt.toLong - prevCnt
          putVarbitInt(w, cd - cntDelta); cntDelta = cd; prevCnt = cnt.toLong
          val zd = zcnt.toLong - prevZcnt
          putVarbitInt(w, zd - zcntDelta); zcntDelta = zd; prevZcnt = zcnt.toLong
          val sb = java.lang.Double.doubleToRawLongBits(sum)
          val r = PromXorChunk.xorWrite(w, sb, sumBits, sumLead, sumTrail)
          sumBits = sb; sumLead = r >>> 8; sumTrail = r & 0xFF
          var k = 0; var run = 0L
          while (k < mP) {
            val v = pAbs(k).toLong - run; run = pAbs(k).toLong
            putVarbitInt(w, (v - iPosVal(k)) - iPosDelta(k))
            iPosDelta(k) = v - iPosVal(k); iPosVal(k) = v; k += 1
          }
          k = 0; run = 0L
          while (k < mN) {
            val v = nAbs(k).toLong - run; run = nAbs(k).toLong
            putVarbitInt(w, (v - iNegVal(k)) - iNegDelta(k))
            iNegDelta(k) = v - iNegVal(k); iNegVal(k) = v; k += 1
          }
        } else {
          def xw(f: Int, v: Double): Unit = {
            val b = java.lang.Double.doubleToRawLongBits(v)
            val r = PromXorChunk.xorWrite(w, b, fBits(f), fLead(f), fTrail(f))
            fBits(f) = b; fLead(f) = r >>> 8; fTrail(f) = r & 0xFF
          }
          xw(0, cnt); xw(1, zcnt); xw(2, sum)
          var k = 0
          while (k < mP) { xw(3 + k, pAbs(k)); k += 1 }
          k = 0
          while (k < mN) { xw(3 + mP + k, nAbs(k)); k += 1 }
        }
      }
      i += 1
    }
    w.toBytes
  }

  // -------------------------------------------------------------- decode
  /** Decode one histogram chunk at bytes[off, ...) into `out` (3-field model
    * rows: ts, value = count, h struct with zero-count buckets dropped);
    * returns the new outPos. */
  def decodeChunkInto(bytes: Array[Byte], off: Int, out: Array[Any],
                      outPos0: Int, float: Boolean): Int = {
    val n = ((bytes(off) & 0xFF) << 8) | (bytes(off + 1) & 0xFF)
    var outPos = outPos0
    if (n == 0) return outPos
    val r = new PromXorChunk.BitReader(bytes, off + 3) // byte 2 = reset header
    val zthr = readZeroThreshold(r)
    val sch = readVarbitInt(r).toInt
    val posIdx = readSpans(r)
    val negIdx = readSpans(r)
    val mP = posIdx.length; val mN = negIdx.length
    // custom-bucket bounds follow the span lists for schema -53 (upstream
    // readHistogramChunkLayout)
    val cbArr: GenericArrayData =
      if (sch == CustomBucketsSchema) {
        val m = readVarbitUint(r).toInt
        if (m < 0 || m > MaxBuckets)
          throw new IllegalArgumentException(
            s"corrupt histogram chunk: $m custom bucket bounds (cap $MaxBuckets)")
        val vals = new Array[Any](m)
        var k = 0
        while (k < m) { vals(k) = readCustomBound(r); k += 1 }
        new GenericArrayData(vals)
      } else null

    var t = 0L; var tDelta = 0L
    var cnt = 0.0; var zcnt = 0.0; var sum = 0.0
    var iCnt = 0L; var cntDelta = 0L; var iZcnt = 0L; var zcntDelta = 0L
    var sumBits = 0L; var sumLead = 0; var sumTrail = 0
    val iVal = new Array[Long](mP + mN); val iDelta = new Array[Long](mP + mN)
    val fBits = new Array[Long](3 + mP + mN)
    val fLead = new Array[Int](3 + mP + mN); val fTrail = new Array[Int](3 + mP + mN)
    val pAbs = new Array[Double](mP); val nAbs = new Array[Double](mN)

    def emit(): Unit = {
      val h = InternalRow(cnt, sum, sch, zthr, zcnt,
        bucketArr(posIdx, pAbs), bucketArr(negIdx, nAbs), cbArr)
      out(outPos) = InternalRow(t, cnt, h); outPos += 1
    }

    var i = 0
    while (i < n) {
      if (i == 0) {
        t = readVarbitInt(r)
        if (!float) {
          iCnt = readVarbitUint(r); iZcnt = readVarbitUint(r)
          sumBits = r.readBits(64)
          cnt = iCnt.toDouble; zcnt = iZcnt.toDouble
          sum = java.lang.Double.longBitsToDouble(sumBits)
          var run = 0L; var k = 0
          while (k < mP) {
            iVal(k) = readVarbitInt(r); run += iVal(k); pAbs(k) = run.toDouble; k += 1
          }
          run = 0L; k = 0
          while (k < mN) {
            iVal(mP + k) = readVarbitInt(r); run += iVal(mP + k); nAbs(k) = run.toDouble; k += 1
          }
        } else {
          fBits(0) = r.readBits(64); fBits(1) = r.readBits(64); fBits(2) = r.readBits(64)
          cnt = java.lang.Double.longBitsToDouble(fBits(0))
          zcnt = java.lang.Double.longBitsToDouble(fBits(1))
          sum = java.lang.Double.longBitsToDouble(fBits(2))
          var k = 0
          while (k < mP) {
            fBits(3 + k) = r.readBits(64)
            pAbs(k) = java.lang.Double.longBitsToDouble(fBits(3 + k)); k += 1
          }
          k = 0
          while (k < mN) {
            fBits(3 + mP + k) = r.readBits(64)
            nAbs(k) = java.lang.Double.longBitsToDouble(fBits(3 + mP + k)); k += 1
          }
        }
      } else {
        tDelta += readVarbitInt(r)
        t += tDelta
        if (!float) {
          cntDelta += readVarbitInt(r); iCnt += cntDelta; cnt = iCnt.toDouble
          zcntDelta += readVarbitInt(r); iZcnt += zcntDelta; zcnt = iZcnt.toDouble
          val st = PromXorChunk.xorRead(r, sumBits, sumLead, sumTrail)
          sumBits = st._1; sumLead = st._2; sumTrail = st._3
          sum = java.lang.Double.longBitsToDouble(sumBits)
          var run = 0L; var k = 0
          while (k < mP) {
            iDelta(k) += readVarbitInt(r); iVal(k) += iDelta(k)
            run += iVal(k); pAbs(k) = run.toDouble; k += 1
          }
          run = 0L; k = 0
          while (k < mN) {
            iDelta(mP + k) += readVarbitInt(r); iVal(mP + k) += iDelta(mP + k)
            run += iVal(mP + k); nAbs(k) = run.toDouble; k += 1
          }
        } else {
          def xr(f: Int): Double = {
            val st = PromXorChunk.xorRead(r, fBits(f), fLead(f), fTrail(f))
            fBits(f) = st._1; fLead(f) = st._2; fTrail(f) = st._3
            java.lang.Double.longBitsToDouble(fBits(f))
          }
          cnt = xr(0); zcnt = xr(1); sum = xr(2)
          var k = 0
          while (k < mP) { pAbs(k) = xr(3 + k); k += 1 }
          k = 0
          while (k < mN) { nAbs(k) = xr(3 + mP + k); k += 1 }
        }
      }
      emit()
      i += 1
    }
    outPos
  }

  /** layout + absolute counts → model bucket array, zero-count buckets
    * dropped (the engine's canonical sparse form). */
  private def bucketArr(idxs: Array[Int], abs: Array[Double]): GenericArrayData = {
    var m = 0; var k = 0
    while (k < idxs.length) { if (abs(k) != 0.0) m += 1; k += 1 }
    val out = new Array[Any](m)
    k = 0; var p = 0
    while (k < idxs.length) {
      if (abs(k) != 0.0) { out(p) = InternalRow(idxs(k), abs(k)); p += 1 }
      k += 1
    }
    new GenericArrayData(out)
  }

  /** The counter-reset header of a chunk's byte 2 (top 2 bits). */
  def counterResetHeader(bytes: Array[Byte], off: Int): Int = bytes(off + 2) & 0xC0
}
