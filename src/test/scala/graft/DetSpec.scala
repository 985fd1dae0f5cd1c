package graft

import org.apache.spark.sql.functions._
import graft.functions.Det

/** The deterministic aggregate helpers' magnitude bands. Above the decimal
  * CEILING, groups take a Prometheus-float fallback and must stay correct —
  * not throw an ANSI decimal-overflow, not silently drop the value. Below
  * the decimal QUANTUM (1e-9 absolute) values quantize — the documented
  * precision floor, deliberately NOT rerouted to float: a data-dependent
  * reroute broke the bit-identity contracts (layer-routed ≡ raw) for
  * ordinary data the moment one tiny sample landed in a group. The fixture
  * values are powers of ten so the in-band decimal results are exact and
  * the expectations are closed-form: values {1,2,3,4}·10^k per group →
  * sum 10·10^k, avg 2.5·10^k, pop-variance 1.25·10^2k. */
class DetSpec extends SparkSpec {

  private def relErr(got: Double, want: Double): Double =
    if (want == 0.0) math.abs(got)
    else math.abs(got - want) / math.abs(want)

  test("magnitude sweep: exact in band, float-correct above it, quantized below the quantum") {
    import spark.implicits._
    val ks = Seq(-300, -30, -12, -9, -6, -3, 0, 3, 9, 15, 18, 20, 100, 290)
    val rows = for { k <- ks; i <- 1 to 4 } yield (k, i * math.pow(10.0, k))
    val got = rows.toDF("k", "v").groupBy($"k").agg(
      Det.dsum($"v").as("s"), Det.davg($"v").as("a"),
      Det.dstddevPop($"v").as("sd"), Det.dvarPop($"v").as("vr"))
      .collect()
      .map(r => r.getInt(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    for (k <- ks) {
      val m = math.pow(10.0, k)
      val (s, a, sd, vr) = got(k)
      if (k >= -9) { // at/above the quantum: exact (float-exact above 1e18)
        assert(relErr(s, 10 * m) < 1e-9, s"sum at 1e$k: got $s")
        assert(relErr(a, 2.5 * m) < 1e-9, s"avg at 1e$k: got $a")
      } else { // below the quantum: deterministic quantization to zero
        assert(s == 0.0, s"sub-quantum sum at 1e$k must quantize: got $s")
        assert(a == 0.0, s"sub-quantum avg at 1e$k must quantize: got $a")
      }
      // moments additionally square the values (quantum at |v| ~ 3e-5) and
      // under/overflow double outside ~1e±150
      if (k >= -3 && k <= 140) {
        assert(relErr(sd, math.sqrt(1.25) * m) < 1e-6, s"stddev at 1e$k: got $sd")
        assert(relErr(vr, 1.25 * m * m) < 1e-6, s"stdvar at 1e$k: got $vr")
      }
    }
  }

  test("extreme and IEEE group shapes") {
    import spark.implicits._
    def agg(vs: Seq[Double]): (Double, Double, Double) = {
      val r = vs.toDF("v")
        .agg(Det.dsum($"v").as("s"), Det.davg($"v").as("a"),
          Det.dstddevPop($"v").as("sd")).head()
      (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    }
    val big = 9.988465674311579e307
    // float-sum overflow → +Inf, but the mean of near-max values is near-max
    val (s1, a1, _) = agg(Seq(big, big))
    assert(s1.isPosInfinity && a1 == big)
    // exact cancellation survives both fallback paths; the stddev is NaN
    // because the Welford DELTA (2·|v|) itself overflows float64 at this
    // magnitude — exactly what Prometheus's own float accumulation does
    // (the finite-delta 1e100 case is pinned in the upstream tranche)
    val (s2, a2, sd2) = agg(Seq(-big, big))
    assert(s2 == 0.0 && a2 == 0.0 && sd2.isNaN)
    // NaN poisons; one infinity sign dominates; mixed signs → NaN
    assert(agg(Seq(1.0, Double.NaN))._1.isNaN)
    assert(agg(Seq(1.0, Double.PositiveInfinity))._1.isPosInfinity)
    assert(agg(Seq(Double.NegativeInfinity, Double.PositiveInfinity))._1.isNaN)
    // timestamp-scale moments (the old decimal v² ceiling was ~3e14)
    val (s3, _, sd3) = agg(Seq(1e15, 1e15 + 4))
    assert(s3 == 2e15 + 4 && sd3 == 2.0)
    // a mixed group: one extreme member routes the whole group to the
    // float path without losing the ordinary members
    val (s4, _, _) = agg(Seq(1e300, 5.0, 7.0))
    assert(s4 == 1e300, "1e300 + 12 == 1e300 in float64 (Prometheus-shaped)")
  }
}
