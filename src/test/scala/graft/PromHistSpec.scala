package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Prometheus native-histogram chunk codec coverage (enc 2/3): varbit and
  * zero-threshold pinned vectors, bit-exact fuzz roundtrips for integer and
  * float chunks (incl. NaN/±Inf sums and schema spread), counter-reset /
  * layout-change / kind-change chunk cuts through the frame columns, and
  * the frame-header time skip. No SparkSession needed — pure codec. */
class PromHistSpec extends AnyFunSuite {

  private def bkt(pairs: (Int, Double)*): GenericArrayData =
    new GenericArrayData(pairs.map { case (i, c) => InternalRow(i, c) }.toArray[Any])

  private def hist(cnt: Double, hsum: Double, sch: Int, zthr: Double,
                   zcnt: Double, pos: Seq[(Int, Double)],
                   neg: Seq[(Int, Double)] = Nil): InternalRow =
    InternalRow(cnt, hsum, sch, zthr, zcnt, bkt(pos: _*), bkt(neg: _*), null)

  private def pts(samples: Seq[(Long, InternalRow)]): GenericArrayData =
    new GenericArrayData(samples.map { case (t, h) =>
      InternalRow(t, h.getDouble(0), h): Any
    }.toArray)

  private def decodeChunk(bytes: Array[Byte], float: Boolean): Seq[(Long, InternalRow)] = {
    val n = PromXorChunk.sampleCount(bytes, 0)
    val out = new Array[Any](n)
    PromHistChunk.decodeChunkInto(bytes, 0, out, 0, float)
    out.toSeq.map { case r: InternalRow => (r.getLong(0), r.getStruct(2, graft.functions.HistChunk.HistArity)) }
  }

  private def bktMap(a: org.apache.spark.sql.catalyst.util.ArrayData): Map[Int, Double] =
    (0 until a.numElements()).map { i =>
      val b = a.getStruct(i, 2); b.getInt(0) -> b.getDouble(1)
    }.toMap

  private def sameHist(a: InternalRow, b: InternalRow): Boolean = {
    def d(x: Double, y: Double) =
      java.lang.Double.doubleToRawLongBits(x) == java.lang.Double.doubleToRawLongBits(y) ||
        (x.isNaN && y.isNaN) // NaN payload may differ only via arithmetic; we move raw bits
    // decode canonicalizes: zero-count buckets drop (absent ≡ 0)
    def bm(r: InternalRow, f: Int) = bktMap(r.getArray(f)).filter(_._2 != 0.0)
    d(a.getDouble(0), b.getDouble(0)) && d(a.getDouble(1), b.getDouble(1)) &&
      a.getInt(2) == b.getInt(2) && d(a.getDouble(3), b.getDouble(3)) &&
      d(a.getDouble(4), b.getDouble(4)) &&
      bm(a, 5) == bm(b, 5) && bm(a, 6) == bm(b, 6)
  }

  // -------------------------------------------------------- pinned vectors
  test("pinned: varbit int prefix codes and asymmetric ranges") {
    def enc(v: Long): String = {
      val w = new PromXorChunk.BitWriter(16)
      PromHistChunk.putVarbitInt(w, v)
      val bytes = w.toBytes
      // re-read to learn the bit length from a fresh reader
      val r = new PromXorChunk.BitReader(bytes, 0)
      assert(PromHistChunk.readVarbitInt(r) == v, s"roundtrip $v")
      bytes.map(b => f"${b & 0xFF}%02x").mkString
    }
    assert(enc(0L) == "00")  // single 0 bit
    assert(enc(4L) == "a0")  // 10 100 → 0b10100_000
    assert(enc(-3L) == "a8") // 10 101 → 0b10101_000 (3-bit wrap of −3)
    assert(enc(5L) == "c280") // 110 000101 → 0b11000010_1
    // asymmetric: +4 fits the 3-bit bucket (1 byte), −4 needs the 6-bit one
    val w4 = new PromXorChunk.BitWriter(16)
    PromHistChunk.putVarbitInt(w4, 4L)
    assert(w4.toBytes.length == 1)
    val w = new PromXorChunk.BitWriter(16)
    PromHistChunk.putVarbitInt(w, -4L)
    assert(w.toBytes.length == 2) // 3 prefix + 6 payload bits
    val r = new PromXorChunk.BitReader(w.toBytes, 0)
    assert(PromHistChunk.readVarbitInt(r) == -4L)
  }

  test("pinned: varbit uint roundtrip across bucket boundaries") {
    for (v <- Seq(0L, 1L, 7L, 8L, 63L, 64L, 511L, 512L, 1L << 18, (1L << 25) - 1,
      1L << 25, (1L << 56) - 1, 1L << 56, -1L /* max uint64 */ )) {
      val w = new PromXorChunk.BitWriter(24)
      PromHistChunk.putVarbitUint(w, v)
      val r = new PromXorChunk.BitReader(w.toBytes, 0)
      assert(PromHistChunk.readVarbitUint(r) == v, s"uint $v")
    }
  }

  test("pinned: zero threshold one-byte and escape forms") {
    def rt(thr: Double): (Double, Int) = {
      val w = new PromXorChunk.BitWriter(16)
      PromHistChunk.putZeroThreshold(w, thr)
      val bytes = w.toBytes
      val r = new PromXorChunk.BitReader(bytes, 0)
      (PromHistChunk.readZeroThreshold(r), bytes.length)
    }
    assert(rt(0.0) == ((0.0, 1)))
    // 2^-128: one byte, exponent −128 + 244 = 116
    val w = new PromXorChunk.BitWriter(16)
    PromHistChunk.putZeroThreshold(w, math.pow(2, -128))
    assert(w.toBytes.toSeq == Seq(116.toByte))
    assert(rt(math.pow(2, -128)) == ((math.pow(2, -128), 1)))
    assert(rt(math.pow(2, 10)) == ((1024.0, 1)))
    assert(rt(math.pow(2, 11))._2 == 9)   // out of one-byte range → escape
    assert(rt(0.001) == ((0.001, 9)))     // not a power of two → escape
    assert(rt(math.pow(2, -243)) == ((math.pow(2, -243), 1)))
    assert(rt(math.pow(2, -244))._2 == 9)
  }

  // ----------------------------------------------------------- roundtrips
  test("integer histogram chunk roundtrips exactly (incl. spans with gaps)") {
    val samples = Seq(
      1000L -> hist(10, 5.5, 0, 0.001, 2, Seq(0 -> 3.0, 1 -> 4.0, 5 -> 1.0), Seq(-2 -> 2.0)),
      2000L -> hist(15, 8.25, 0, 0.001, 3, Seq(0 -> 4.0, 1 -> 6.0, 5 -> 1.0, 6 -> 1.0), Seq(-2 -> 3.0)),
      3000L -> hist(21, 12.0, 0, 0.001, 4, Seq(0 -> 6.0, 1 -> 8.0, 5 -> 2.0, 6 -> 1.0), Seq(-2 -> 4.0)))
    val enc = PromHistChunk.encodeChunk(pts(samples), 0, 3,
      PromHistChunk.UnknownCounterReset, float = false)
    assert(PromHistChunk.counterResetHeader(enc, 0) == PromHistChunk.UnknownCounterReset)
    val dec = decodeChunk(enc, float = false)
    assert(dec.size == 3)
    samples.zip(dec).foreach { case ((t, h), (dt, dh)) =>
      assert(t == dt); assert(sameHist(h, dh), s"at $t")
    }
  }

  test("float histogram chunk roundtrips bit-exactly (incl. NaN sum)") {
    val samples = Seq(
      1000L -> hist(10.5, 5.5, -1, 0.0, 2.25, Seq(0 -> 3.5, 2 -> 4.25)),
      2000L -> hist(12.75, Double.NaN, -1, 0.0, 2.25, Seq(0 -> 4.5, 2 -> 4.25, 3 -> 0.5)),
      3000L -> hist(20.0, Double.PositiveInfinity, -1, 0.0, 3.0, Seq(0 -> 9.0, 2 -> 5.0, 3 -> 1.0)))
    val enc = PromHistChunk.encodeChunk(pts(samples), 0, 3,
      PromHistChunk.NotCounterReset, float = true)
    assert(PromHistChunk.counterResetHeader(enc, 0) == PromHistChunk.NotCounterReset)
    val dec = decodeChunk(enc, float = true)
    samples.zip(dec).foreach { case ((t, h), (dt, dh)) =>
      assert(t == dt); assert(sameHist(h, dh), s"at $t")
    }
  }

  test("property: random integer histogram runs roundtrip") {
    val genBuckets = for {
      n <- Gen.chooseNum(0, 6)
      idxs <- Gen.pick(n, -8 to 12)
      cs <- Gen.listOfN(n, Gen.chooseNum(1L, 1000000L))
    } yield idxs.sorted.zip(cs.map(_.toDouble))
    val genRun = for {
      n <- Gen.chooseNum(1, 60)
      sch <- Gen.chooseNum(-4, 8)
      zthr <- Gen.oneOf(0.0, 0.001, math.pow(2, -128))
      t0 <- Gen.chooseNum(0L, 1700000000000L)
      ds <- Gen.listOfN(n - 1, Gen.chooseNum(1L, 120000L))
      bs <- Gen.listOfN(n, genBuckets)
      cnts <- Gen.listOfN(n, Gen.chooseNum(0L, 100000L))
      zs <- Gen.listOfN(n, Gen.chooseNum(0L, 1000L))
      sums <- Gen.listOfN(n, Gen.chooseNum(-1e9, 1e9))
    } yield {
      val ts = ds.scanLeft(t0)(_ + _)
      ts.lazyZip(bs).lazyZip(cnts.zip(zs)).lazyZip(sums).toList.map {
        case (t, b, (c, z), s) =>
          t -> hist(c.toDouble, s, sch, zthr, z.toDouble, b.toSeq)
      }
    }
    val prop = Prop.forAll(genRun) { run =>
      val enc = PromHistChunk.encodeChunk(pts(run), 0, run.size,
        PromHistChunk.UnknownCounterReset, float = false)
      val dec = decodeChunk(enc, float = false)
      dec.size == run.size && run.zip(dec).forall { case ((t, h), (dt, dh)) =>
        t == dt && sameHist(h, dh)
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(150), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: random float histogram runs roundtrip bit-exactly") {
    val genC = Gen.oneOf(Gen.chooseNum(0.001, 1e9), Gen.chooseNum(-1.0, 1.0).map(math.abs))
    val genBuckets = for {
      n <- Gen.chooseNum(0, 5)
      idxs <- Gen.pick(n, -6 to 10)
      cs <- Gen.listOfN(n, genC)
    } yield idxs.sorted.zip(cs)
    val genRun = for {
      n <- Gen.chooseNum(1, 50)
      sch <- Gen.chooseNum(-4, 8)
      t0 <- Gen.chooseNum(0L, 1700000000000L)
      ds <- Gen.listOfN(n - 1, Gen.chooseNum(1L, 60000L))
      bs <- Gen.listOfN(n, genBuckets)
      cnts <- Gen.listOfN(n, genC)
      sums <- Gen.listOfN(n, Gen.oneOf(genC,
        Gen.oneOf(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity, -0.0)))
    } yield {
      val ts = ds.scanLeft(t0)(_ + _)
      ts.lazyZip(bs).lazyZip(cnts).lazyZip(sums).toList.map { case (t, b, c, s) =>
        t -> hist(c, s, sch, 0.0, 0.5, b.toSeq)
      }
    }
    val prop = Prop.forAll(genRun) { run =>
      val enc = PromHistChunk.encodeChunk(pts(run), 0, run.size,
        PromHistChunk.GaugeType, float = true)
      val dec = decodeChunk(enc, float = true)
      dec.size == run.size && run.zip(dec).forall { case ((t, h), (dt, dh)) =>
        t == dt && sameHist(h, dh)
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(150), prop)
    assert(res.passed, res.status.toString)
  }

  // ------------------------------------------------- frame columns + cuts
  private def frames(cell: Array[Byte]): Seq[(Int, Long, Long, Int)] = {
    var off = 0
    val out = scala.collection.mutable.ArrayBuffer[(Int, Long, Long, Int)]()
    def u32(o: Int) = ((cell(o) & 0xFF) << 24) | ((cell(o + 1) & 0xFF) << 16) |
      ((cell(o + 2) & 0xFF) << 8) | (cell(o + 3) & 0xFF)
    def u64(o: Int) = (0 until 8).foldLeft(0L)((a, i) => (a << 8) | (cell(o + i) & 0xFFL))
    while (off < cell.length) {
      val enc = u32(off)
      val mint = PromXorChunk.unzigzag(u64(off + 4))
      val maxt = PromXorChunk.unzigzag(u64(off + 12))
      val len = u32(off + 20)
      out += ((enc, mint, maxt, off + 24))
      off += 24 + len
    }
    out.toSeq
  }

  test("mixed day: kind changes cut frames; enc tags 1/2/3 as content demands") {
    val day = 1704067200000L
    val floatPt = (t: Long, v: Double) => InternalRow(t, v, null): Any
    val histPt = (t: Long, h: InternalRow) => InternalRow(t, h.getDouble(0), h): Any
    val hInt = hist(5, 1.0, 0, 0.0, 0, Seq(0 -> 5.0))
    val hFlt = hist(5.5, 1.0, 0, 0.0, 0, Seq(0 -> 5.5))
    val points = new GenericArrayData(Array[Any](
      floatPt(day + 1000L, 1.0), floatPt(day + 2000L, 2.0),
      histPt(day + 3000L, hInt), histPt(day + 4000L, hInt),
      histPt(day + 5000L, hFlt),
      floatPt(day + 6000L, 3.0)))
    val cols = PromXorChunk.encodeColumns(points)
    val fs = frames(cols.getBinary(0))
    assert(fs.map(_._1) == Seq(1, 2, 3, 1), s"enc tags: ${fs.map(_._1)}")
    // decode returns every sample in order with h where histogram
    val dec = PromXorChunk.decodeFrames(cols.getBinary(0))
    assert(dec.numElements() == 6)
    assert((0 until 6).map(i => dec.getStruct(i, 3).isNullAt(2)) ==
      Seq(true, true, false, false, false, true))
  }

  test("counter reset cuts a chunk and stamps the CounterReset header") {
    val day = 1704067200000L
    val h1 = hist(10, 1.0, 0, 0.0, 0, Seq(0 -> 10.0))
    val h2 = hist(12, 2.0, 0, 0.0, 0, Seq(0 -> 12.0))
    val h3 = hist(3, 0.5, 0, 0.0, 0, Seq(0 -> 3.0)) // reset: 12 → 3
    val h4 = hist(5, 0.8, 0, 0.0, 0, Seq(0 -> 5.0))
    val points = pts(Seq(day + 1000L -> h1, day + 2000L -> h2,
      day + 3000L -> h3, day + 4000L -> h4))
    val cols = PromXorChunk.encodeColumns(points)
    val fs = frames(cols.getBinary(0))
    assert(fs.size == 2, s"expected reset cut: $fs")
    assert(PromHistChunk.counterResetHeader(cols.getBinary(0), fs(0)._4) ==
      PromHistChunk.UnknownCounterReset)
    assert(PromHistChunk.counterResetHeader(cols.getBinary(0), fs(1)._4) ==
      PromHistChunk.CounterReset)
    val dec = PromXorChunk.decodeFrames(cols.getBinary(0))
    assert((0 until 4).map(i => dec.getStruct(i, 3).getStruct(2, graft.functions.HistChunk.HistArity).getDouble(0)) ==
      Seq(10.0, 12.0, 3.0, 5.0))
  }

  test("schema change cuts a chunk with an Unknown header") {
    val day = 1704067200000L
    val points = pts(Seq(
      day + 1000L -> hist(4, 1.0, 0, 0.0, 0, Seq(0 -> 4.0)),
      day + 2000L -> hist(6, 2.0, 1, 0.0, 0, Seq(0 -> 6.0)), // schema 0 → 1
      day + 3000L -> hist(8, 3.0, 1, 0.0, 0, Seq(0 -> 8.0))))
    val cols = PromXorChunk.encodeColumns(points)
    val fs = frames(cols.getBinary(0))
    assert(fs.size == 2)
    assert(PromHistChunk.counterResetHeader(cols.getBinary(0), fs(1)._4) ==
      PromHistChunk.UnknownCounterReset)
    val dec = PromXorChunk.decodeFrames(cols.getBinary(0))
    assert((0 until 3).map(i => dec.getStruct(i, 3).getStruct(2, graft.functions.HistChunk.HistArity).getInt(2)) ==
      Seq(0, 1, 1))
  }

  test("reset coinciding with a 2h boundary cut still stamps CounterReset") {
    val day = 1704067200000L
    // the boundary ends the run before the reset check used to fire —
    // upstream checks appendability at every append, so the next chunk
    // must still carry the reset hint (ADVICE r14)
    val points = pts(Seq(
      day + 1000L -> hist(10, 1.0, 0, 0.0, 0, Seq(0 -> 10.0)),
      day + 2 * 3600000L + 1000L -> hist(3, 0.5, 0, 0.0, 0, Seq(0 -> 3.0)),
      day + 2 * 3600000L + 2000L -> hist(5, 0.8, 0, 0.0, 0, Seq(0 -> 5.0))))
    val cell = PromXorChunk.encodeColumns(points).getBinary(0)
    val fs = frames(cell)
    assert(fs.size == 2)
    assert(PromHistChunk.counterResetHeader(cell, fs(1)._4) ==
      PromHistChunk.CounterReset)

    // continuity across the boundary (no reset) stays NotCounterReset
    val cont = pts(Seq(
      day + 1000L -> hist(10, 1.0, 0, 0.0, 0, Seq(0 -> 10.0)),
      day + 2 * 3600000L + 1000L -> hist(12, 1.5, 0, 0.0, 0, Seq(0 -> 12.0))))
    val cell2 = PromXorChunk.encodeColumns(cont).getBinary(0)
    val cfs = frames(cell2)
    assert(cfs.size == 2)
    assert(PromHistChunk.counterResetHeader(cell2, cfs(1)._4) ==
      PromHistChunk.NotCounterReset)
  }

  test("histogram after a float chunk or kind change stamps Unknown, not NotCounterReset") {
    val day = 1704067200000L
    val floatPt = (t: Long, v: Double) => InternalRow(t, v, null): Any
    val histPt = (t: Long, h: InternalRow) => InternalRow(t, h.getDouble(0), h): Any
    val hInt = hist(5, 1.0, 0, 0.0, 0, Seq(0 -> 5.0))
    val hFlt = hist(5.5, 1.0, 0, 0.0, 0, Seq(0 -> 5.5))
    // a histogram chunk after a FLOAT chunk has no histogram predecessor to
    // be "not reset" against; an int→float kind change without a reset is
    // likewise Unknown continuity
    val points = new GenericArrayData(Array[Any](
      floatPt(day + 1000L, 1.0),
      histPt(day + 2000L, hInt),
      histPt(day + 3000L, hFlt)))
    val cell = PromXorChunk.encodeColumns(points).getBinary(0)
    val fs = frames(cell)
    assert(fs.map(_._1) == Seq(1, 2, 3))
    assert(PromHistChunk.counterResetHeader(cell, fs(1)._4) ==
      PromHistChunk.UnknownCounterReset)
    assert(PromHistChunk.counterResetHeader(cell, fs(2)._4) ==
      PromHistChunk.UnknownCounterReset)

    // an int→float kind change that IS a reset still stamps CounterReset
    val hFltReset = hist(2.5, 0.3, 0, 0.0, 0, Seq(0 -> 2.5))
    val p2 = pts(Seq(day + 1000L -> hInt, day + 2000L -> hFltReset))
    val cell3 = PromXorChunk.encodeColumns(p2).getBinary(0)
    val fs2 = frames(cell3)
    assert(fs2.map(_._1) == Seq(2, 3))
    assert(PromHistChunk.counterResetHeader(cell3, fs2(1)._4) ==
      PromHistChunk.CounterReset)
  }

  test("frame-header time skip: out-of-range frames never decode") {
    val day = 1704067200000L
    // two 2h-cut float chunks in cell 0: [0h,2h) and [2h,4h)
    val points = new GenericArrayData(Array[Any](
      InternalRow(day + 1000L, 1.0, null),
      InternalRow(day + 2 * 3600000L + 1000L, 2.0, null)))
    val cell = PromXorChunk.encodeColumns(points).getBinary(0)
    assert(frames(cell).size == 2)
    val dec = PromXorChunk.decodeFrames(cell, day + 2 * 3600000L, Long.MaxValue)
    assert(dec.numElements() == 1)
    assert(dec.getStruct(0, 3).getDouble(1) == 2.0)
    val none = PromXorChunk.decodeFrames(cell, day + 5 * 3600000L, Long.MaxValue)
    assert(none.numElements() == 0)
  }

  // ----------------------------------------------------------- NHCB (-53)
  private def nhcb(cnt: Double, hsum: Double, pos: Seq[(Int, Double)],
                   bounds: Seq[Double]): InternalRow =
    InternalRow(cnt, hsum, CB_SCHEMA, 0.0, 0.0, bkt(pos: _*), bkt(),
      new GenericArrayData(bounds.toArray[Any]))
  private val CB_SCHEMA = -53

  test("pinned: custom-bound codec — doubled-integer varbit vs raw-float escape") {
    def rt(v: Double): (Double, Int) = {
      val w = new PromXorChunk.BitWriter(16)
      PromHistChunk.putCustomBound(w, v)
      val bytes = w.toBytes
      val r = new PromXorChunk.BitReader(bytes, 0)
      (PromHistChunk.readCustomBound(r), bytes.length)
    }
    // 0.5 → tf=1 → varbit uint '10'+3 bits = 1 byte; 1.0 → tf=2 likewise
    assert(rt(0.5) == ((0.5, 1)))
    assert(rt(1.0) == ((1.0, 1)))
    assert(rt(0.0) == ((0.0, 1)))     // tf=0 → single 0 bit
    assert(rt(10.0) == ((10.0, 2)))   // tf=20 → 3-bit prefix + 6-bit payload
    assert(rt(16777215.0) == ((16777215.0, 4)))  // tf = 2^25-2, 25-bit bucket
    // not a half-integer / too large / negative → 8-ones prefix + raw f64
    assert(rt(0.001) == ((0.001, 9)))
    assert(rt(16777215.5) == ((16777215.5, 9)))  // tf = 33554431 > the cap
    assert(rt(-1.0) == ((-1.0, 9)))
    assert(rt(Double.PositiveInfinity) == ((Double.PositiveInfinity, 9)))
  }

  test("NHCB chunk roundtrips with custom bounds (enc 2 and enc 3)") {
    val bounds = Seq(0.1, 0.5, 1.0, 2.5)
    val samples = Seq(
      1000L -> nhcb(10, 4.5, Seq(0 -> 2.0, 1 -> 5.0, 4 -> 3.0), bounds),
      2000L -> nhcb(14, 6.0, Seq(0 -> 3.0, 1 -> 7.0, 4 -> 4.0), bounds),
      3000L -> nhcb(21, 9.5, Seq(0 -> 5.0, 1 -> 11.0, 4 -> 5.0), bounds))
    val enc = PromHistChunk.encodeChunk(pts(samples), 0, 3,
      PromHistChunk.UnknownCounterReset, float = false)
    val dec = decodeChunk(enc, float = false)
    samples.zip(dec).foreach { case ((t, h), (dt, dh)) =>
      assert(t == dt); assert(sameHist(h, dh), s"at $t")
      assert(dh.getArray(7).toDoubleArray().toSeq == bounds, s"bounds at $t")
    }
    // float path: fractional counts force enc 3
    val fs = Seq(
      1000L -> nhcb(10.5, 4.5, Seq(0 -> 2.5, 2 -> 8.0), bounds),
      2000L -> nhcb(14.25, 6.0, Seq(0 -> 3.25, 2 -> 11.0), bounds))
    val fenc = PromHistChunk.encodeChunk(pts(fs), 0, 2,
      PromHistChunk.UnknownCounterReset, float = true)
    val fdec = decodeChunk(fenc, float = true)
    fs.zip(fdec).foreach { case ((t, h), (dt, dh)) =>
      assert(t == dt); assert(sameHist(h, dh), s"float at $t")
      assert(dh.getArray(7).toDoubleArray().toSeq == bounds)
    }
  }

  test("NHCB: custom-bounds change is a layout cut; frame columns roundtrip") {
    val day = 1704067200000L
    val b1 = Seq(0.5, 1.0); val b2 = Seq(0.5, 1.0, 5.0)
    val points = pts(Seq(
      day + 1000L -> nhcb(4, 1.0, Seq(0 -> 4.0), b1),
      day + 2000L -> nhcb(6, 2.0, Seq(0 -> 6.0), b1),
      day + 3000L -> nhcb(8, 3.0, Seq(0 -> 6.0, 2 -> 2.0), b2)))
    val cell = PromXorChunk.encodeColumns(points).getBinary(0)
    var off = 0; var frames = 0
    while (off < cell.length) {
      val len = ((cell(off + 20) & 0xFF) << 24) | ((cell(off + 21) & 0xFF) << 16) |
        ((cell(off + 22) & 0xFF) << 8) | (cell(off + 23) & 0xFF)
      frames += 1; off += 24 + len
    }
    assert(frames == 2, "bounds change must cut a chunk")
    val dec = PromXorChunk.decodeFrames(cell)
    assert(dec.numElements() == 3)
    val h2 = dec.getStruct(2, 3).getStruct(2, graft.functions.HistChunk.HistArity)
    assert(h2.getArray(7).toDoubleArray().toSeq == b2)
  }

  test("property: random NHCB runs roundtrip (bounds, sparse buckets, both encs)") {
    val genBounds = for {
      m <- Gen.chooseNum(1, 8)
      raw <- Gen.listOfN(m, Gen.oneOf(
        Gen.chooseNum(1, 2000).map(_ / 2.0),   // varbit-favored half-integers
        Gen.chooseNum(0.0001, 100.0)))         // raw-escape floats
    } yield raw.distinct.sorted
    val genRun = for {
      bounds <- genBounds
      n <- Gen.chooseNum(1, 40)
      t0 <- Gen.chooseNum(0L, 1700000000000L)
      ds <- Gen.listOfN(n - 1, Gen.chooseNum(1L, 120000L))
      css <- Gen.listOfN(n, Gen.listOfN(bounds.size + 1, Gen.chooseNum(0L, 100000L)))
    } yield {
      val ts = ds.scanLeft(t0)(_ + _)
      ts.zip(css).map { case (t, cs) =>
        val pos = cs.zipWithIndex.collect { case (c, i) if c > 0 => i -> c.toDouble }
        t -> nhcb(cs.map(_.toDouble).sum, cs.sum / 10.0, pos, bounds)
      }
    }
    val prop = Prop.forAll(genRun) { run =>
      val float = false
      val enc = PromHistChunk.encodeChunk(pts(run), 0, run.size, 0, float)
      val dec = decodeChunk(enc, float)
      dec.size == run.size && run.zip(dec).forall { case ((t, h), (dt, dh)) =>
        t == dt && sameHist(h, dh) &&
          dh.getArray(7).toDoubleArray().toSeq == h.getArray(7).toDoubleArray().toSeq
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(120), prop)
    assert(res.passed, res.status.toString)
  }
}
