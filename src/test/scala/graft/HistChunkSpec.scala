package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.HistChunk

/** Histogram chunk codec: bit-exact roundtrip over adversarial histogram
  * sequences — IEEE payload classes, schema switches, bucket churn,
  * irregular timestamps — plus the all-or-nothing null guard. */
class HistChunkSpec extends AnyFunSuite {

  private case class H(cnt: Double, hsum: Double, sch: Int, zthr: Double,
                       zcnt: Double, pos: Seq[(Int, Double)], neg: Seq[(Int, Double)])
  private case class P(ts: Long, v: Double, h: H)

  private def bkt(bs: Seq[(Int, Double)]) =
    new GenericArrayData(bs.map { case (i, c) => InternalRow(i, c) }.toArray[Any])
  private def row(p: P): InternalRow =
    InternalRow(p.ts, p.v,
      InternalRow(p.h.cnt, p.h.hsum, p.h.sch, p.h.zthr, p.h.zcnt,
        bkt(p.h.pos), bkt(p.h.neg), null))
  private def arr(ps: Seq[P]) = new GenericArrayData(ps.map(row).toArray[Any])

  private def roundtrip(ps: Seq[P]): Seq[P] = {
    val dec = HistChunk.decode(HistChunk.encode(arr(ps)))
    (0 until dec.numElements()).map { i =>
      val r = dec.getStruct(i, 3)
      val h = r.getStruct(2, graft.functions.HistChunk.HistArity)
      def buckets(a: org.apache.spark.sql.catalyst.util.ArrayData) =
        (0 until a.numElements()).map { j =>
          val b = a.getStruct(j, 2); (b.getInt(0), b.getDouble(1))
        }
      P(r.getLong(0), r.getDouble(1),
        H(h.getDouble(0), h.getDouble(1), h.getInt(2), h.getDouble(3),
          h.getDouble(4), buckets(h.getArray(5)), buckets(h.getArray(6))))
    }
  }

  private def bits(d: Double) = java.lang.Double.doubleToRawLongBits(d)
  private def sameBits(a: Seq[P], b: Seq[P]): Boolean =
    a.size == b.size && a.zip(b).forall { case (x, y) =>
      x.ts == y.ts && bits(x.v) == bits(y.v) &&
        bits(x.h.cnt) == bits(y.h.cnt) && bits(x.h.hsum) == bits(y.h.hsum) &&
        x.h.sch == y.h.sch && bits(x.h.zthr) == bits(y.h.zthr) &&
        bits(x.h.zcnt) == bits(y.h.zcnt) &&
        x.h.pos.size == y.h.pos.size && x.h.neg.size == y.h.neg.size &&
        x.h.pos.zip(y.h.pos).forall { case (p, q) => p._1 == q._1 && bits(p._2) == bits(q._2) } &&
        x.h.neg.zip(y.h.neg).forall { case (p, q) => p._1 == q._1 && bits(p._2) == bits(q._2) }
    }

  test("empty and singleton chunks roundtrip") {
    assert(roundtrip(Nil).isEmpty)
    val one = Seq(P(1704067200000L, 42.0,
      H(42.0, 17.25, 0, 0.001953125, 3.0, Seq(0 -> 5.0, 3 -> 7.0), Nil)))
    assert(sameBits(roundtrip(one), one))
  }

  test("special IEEE payloads survive in every double field") {
    val specials = Seq(Double.NaN, graft.functions.IsStale.StaleNaN,
      Double.PositiveInfinity, Double.NegativeInfinity, -0.0, 0.0, 1e-308)
    val ps = specials.zipWithIndex.map { case (s, i) =>
      P(1000L + i * 977L, s,
        H(s, s, i - 3, s, s, Seq((i - 5) -> s, (i + 40) -> 1.0), Seq(-i -> s)))
    }
    assert(sameBits(roundtrip(ps), ps))
  }

  test("schema switches, bucket churn, negative/large idx jumps, dod edges") {
    val rnd = new scala.util.Random(11)
    val ts = Seq(0L, 15000L, 30000L, 30000L + 8191, 45000L, 45000L - 8192,
      120000L, 120000L + 524287, 900000L).scanLeft(1704067200000L)(_ + _)
    val ps = ts.zipWithIndex.map { case (t, i) =>
      val nPos = rnd.nextInt(6)
      val idxs = Iterator.iterate(rnd.nextInt(200) - 100)(x =>
        x + 1 + rnd.nextInt(300)).take(nPos).toSeq
      P(t, rnd.nextDouble() * 1e6,
        H(i * 10.0 + rnd.nextInt(3), rnd.nextDouble() * 1e9 - 5e8,
          if (i % 3 == 0) 0 else if (i % 3 == 1) -4 else 8,
          0.001953125, rnd.nextInt(10),
          idxs.map(_ -> (rnd.nextInt(100).toDouble + 1)),
          if (i % 2 == 0) Nil else Seq(rnd.nextInt(50) -> 2.0)))
    }
    assert(sameBits(roundtrip(ps), ps))
  }

  test("random fuzz: 200 chunks of up to 64 samples roundtrip bit-exactly") {
    val rnd = new scala.util.Random(1234)
    (0 until 200).foreach { k =>
      var t = 1704067200000L + rnd.nextInt(100000)
      val ps = (0 until 1 + rnd.nextInt(64)).map { i =>
        t += 1 + rnd.nextInt(90000)
        val nb = rnd.nextInt(8)
        val idxs = Iterator.iterate(rnd.nextInt(64) - 32)(x =>
          x + 1 + rnd.nextInt(20)).take(nb).toSeq
        // arbitrary bit patterns through the double lens
        P(t, java.lang.Double.longBitsToDouble(rnd.nextLong()),
          H(java.lang.Double.longBitsToDouble(rnd.nextLong()), rnd.nextGaussian() * 1e4,
            rnd.nextInt(17) - 8, rnd.nextDouble(), rnd.nextInt(5),
            idxs.map(_ -> java.lang.Double.longBitsToDouble(rnd.nextLong())),
            idxs.take(rnd.nextInt(nb + 1)).map(_ -> rnd.nextDouble())))
      }
      withClue(s"chunk $k") { assert(sameBits(roundtrip(ps), ps)) }
    }
  }

  test("a null histogram among the points fails loudly") {
    val ok = row(P(1000L, 1.0, H(1, 1, 0, 0.1, 0, Nil, Nil)))
    val bad = InternalRow(2000L, 2.0, null)
    val ex = intercept[IllegalArgumentException](
      HistChunk.encode(new GenericArrayData(Array[Any](ok, bad))))
    assert(ex.getMessage.contains("all-histogram or all-float"))
  }

  test("NHCB custom bounds ride the same-as-previous flag and roundtrip") {
    val cb = new GenericArrayData(Array[Any](0.5, 1.0))
    val h = InternalRow(4.0, 2.0, -53, 0.0, 0.0,
      bkt(Seq(0 -> 3.0, 2 -> 1.0)), bkt(Nil), cb)
    val pts = new GenericArrayData(Array[Any](
      InternalRow(1000L, 4.0, h), InternalRow(2000L, 4.0, h)))
    val dec = HistChunk.decode(HistChunk.encode(pts))
    (0 until 2).foreach { i =>
      val hh = dec.getStruct(i, 3).getStruct(2, HistChunk.HistArity)
      assert(hh.getInt(2) == -53)
      assert(hh.getArray(7).toDoubleArray().toSeq == Seq(0.5, 1.0), s"sample $i")
    }
    // standard histograms keep a null cb through the roundtrip
    val std = row(P(1000L, 1.0, H(1, 1, 0, 0.1, 0, Seq(0 -> 1.0), Nil)))
    val dec2 = HistChunk.decode(HistChunk.encode(
      new GenericArrayData(Array[Any](std))))
    assert(dec2.getStruct(0, 3).getStruct(2, HistChunk.HistArity).isNullAt(7))
  }
}
