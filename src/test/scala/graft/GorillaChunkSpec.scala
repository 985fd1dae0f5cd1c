package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.functions.GorillaChunk

/** Gorilla codec unit + property coverage: bit-exact roundtrip over every
  * IEEE payload class, plus the compression bound the design claims. */
class GorillaChunkSpec extends AnyFunSuite {

  private def arr(pts: Seq[(Long, Double)]) =
    new GenericArrayData(pts.map { case (t, v) => InternalRow(t, v) }.toArray[Any])

  private def roundtrip(pts: Seq[(Long, Double)]): Seq[(Long, Double)] = {
    val dec = GorillaChunk.decode(GorillaChunk.encode(arr(pts)))
    (0 until dec.numElements()).map { i =>
      val r = dec.getStruct(i, 2)
      (r.getLong(0), r.getDouble(1))
    }
  }

  /** Bit-exact equality (NaN payloads and -0.0 must survive). */
  private def sameBits(a: Seq[(Long, Double)], b: Seq[(Long, Double)]): Boolean =
    a.size == b.size && a.zip(b).forall { case ((t1, v1), (t2, v2)) =>
      t1 == t2 && java.lang.Double.doubleToRawLongBits(v1) ==
        java.lang.Double.doubleToRawLongBits(v2)
    }

  test("empty and singleton chunks roundtrip") {
    assert(roundtrip(Nil).isEmpty)
    val one = Seq((1704067200000L, 42.5))
    assert(sameBits(roundtrip(one), one))
  }

  test("special values survive bit-exactly: NaN, stale NaN, ±Inf, -0.0") {
    val pts = Seq(
      (1000L, Double.NaN),
      (2000L, graft.functions.IsStale.StaleNaN),
      (3000L, Double.PositiveInfinity),
      (4000L, Double.NegativeInfinity),
      (5000L, -0.0),
      (6000L, 0.0))
    assert(sameBits(roundtrip(pts), pts))
  }

  test("irregular timestamps incl. dod bucket edges roundtrip") {
    // hit each dod bucket: 0, ±14-bit, ±17-bit, ±20-bit edges, 64-bit raw
    val deltas = Seq(15000L, 15000L, 15000L + 8191, 15000L, 15000L - 8192,
      15000L + 65535, 15000L, 15000L - 65536, 15000L + 524287, 15000L,
      15000L - 524288, 15000L + 9999999L, 15000L)
    val ts = deltas.scanLeft(1704067200000L)(_ + _)
    val pts = ts.zipWithIndex.map { case (t, i) => (t, i * 1.5) }
    assert(sameBits(roundtrip(pts), pts))
  }

  test("property: random sorted series roundtrips bit-exactly") {
    val special = Seq(Double.NaN, graft.functions.IsStale.StaleNaN,
      Double.PositiveInfinity, Double.NegativeInfinity, -0.0, 0.0)
    val genVal = Gen.oneOf(
      Gen.oneOf(special),
      Gen.chooseNum(-1e12, 1e12),
      Gen.chooseNum(-1000.0, 1000.0))
    val genDelta = Gen.oneOf(Gen.const(15000L), Gen.chooseNum(1L, 4000000L))
    val genSeries = for {
      n <- Gen.chooseNum(0, 200)
      deltas <- Gen.listOfN(n, genDelta)
      vals <- Gen.listOfN(n, genVal)
    } yield deltas.scanLeft(1704067200000L)(_ + _).tail.zip(vals)
    val prop = Prop.forAll(genSeries) { pts => sameBits(roundtrip(pts), pts) }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("regular series compresses well under 16 bytes/sample") {
    // 15s cadence, counter-ish slowly increasing values: the Gorilla sweet
    // spot. Not asserting the paper's 1.37 B/sample (value entropy differs),
    // but an order-of-magnitude win over raw must hold.
    val pts = (0 until 1000).map(i => (1704067200000L + i * 15000L, 100.0 + i))
    val bytes = GorillaChunk.encode(arr(pts)).length
    assert(bytes.toDouble / pts.size < 4.0, s"got $bytes bytes for ${pts.size} samples")
    assert(sameBits(roundtrip(pts), pts))
  }
}
