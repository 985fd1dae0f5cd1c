package graft

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.promql.NativeHistograms

/** Semantics of native-histogram quantile/fraction against hand-computed
  * Prometheus v3 expectations (promql/quantile.go): exponential
  * interpolation in exponential buckets, linear in the zero bucket,
  * mirrored on the negative side, sign-clamped zero-bucket bounds. */
class NativeHistogramSpec extends SparkSpec {
  import NativeHistograms._

  private def hist(cnt: Double, hsum: Double, sch: Int, zthr: Double, zcnt: Double,
                   pos: Seq[(Int, Double)], neg: Seq[(Int, Double)]): Column =
    struct(
      lit(cnt).as("cnt"), lit(hsum).as("hsum"), lit(sch).as("sch"),
      lit(zthr).as("zthr"), lit(zcnt).as("zcnt"),
      arr(pos).as("pos"), arr(neg).as("neg"), lit(null).cast("array<double>").as("cb"))

  private def arr(b: Seq[(Int, Double)]): Column =
    if (b.isEmpty) array().cast("array<struct<idx:int,c:double>>")
    else array(b.map { case (i, c) => struct(lit(i).as("idx"), lit(c).as("c")) }: _*)

  private def eval(c: Column): Double = {
    val r = spark.range(1).select(c.as("v")).head()
    r.getDouble(0)
  }

  // (0.5,1]:2  (2,4]:3  (4,8]:5 — cnt 10, schema 0
  private val posOnly = hist(10, 30, 0, 0.001953125, 0, Seq(0 -> 2.0, 2 -> 3.0, 3 -> 5.0), Nil)

  test("quantile: positive buckets, exponential interpolation") {
    assert(eval(quantile(lit(0.5), posOnly)) === 4.0) // rank 5 = top of (2,4]
    val q90 = eval(quantile(lit(0.9), posOnly)) // rank 9 → (4,8], f=0.8 → 2^2.8
    assert(math.abs(q90 - math.pow(2.0, 2.8)) < 1e-12)
    assert(eval(quantile(lit(0.0), posOnly)) === 0.5) // lower edge of lowest bucket
    assert(eval(quantile(lit(1.0), posOnly)) === 8.0) // upper edge of highest
  }

  test("quantile: out-of-range and NaN phi, empty histogram") {
    assert(eval(quantile(lit(-0.1), posOnly)).isNegInfinity)
    assert(eval(quantile(lit(1.1), posOnly)).isPosInfinity)
    assert(eval(quantile(lit(Double.NaN), posOnly)).isNaN)
    val empty = hist(0, 0, 0, 0.001953125, 0, Nil, Nil)
    assert(eval(quantile(lit(0.5), empty)).isNaN)
  }

  test("quantile: zero bucket is linear with sign-clamped bounds") {
    // 4 zeros + (1,2]:4 — no negatives, so the zero bucket is [0, zthr]
    val zthr = 0.001953125
    val h = hist(8, 6, 0, zthr, 4, Seq(1 -> 4.0), Nil)
    assert(eval(quantile(lit(0.25), h)) === zthr / 2) // rank 2 of 4 zeros, linear from 0
    val q75 = eval(quantile(lit(0.75), h)) // rank 6 → target 2 in (1,2], f=0.5
    assert(math.abs(q75 - math.sqrt(2.0)) < 1e-12)
  }

  test("quantile: negative buckets mirror the exponential interpolation") {
    // [-2,-1):3 at idx 1, [-4,-2):1 at idx 2 — cnt 4, walk deep-end first
    val h = hist(4, -8, 0, 0.001953125, 0, Nil, Seq(1 -> 3.0, 2 -> 1.0))
    assert(eval(quantile(lit(0.25), h)) === -2.0) // rank 1 exhausts [-4,-2)
    val q50 = eval(quantile(lit(0.5), h)) // rank 2 → [-2,-1), f=1/3 → -2^(1-1/3)
    assert(math.abs(q50 - -math.pow(2.0, 2.0 / 3.0)) < 1e-12)
    assert(eval(quantile(lit(0.0), h)) === -4.0)
    assert(eval(quantile(lit(1.0), h)) === -1.0)
  }

  test("quantile: schema 1 halves the log-width") {
    // (1,√2]:1  (√2,2]:1 at w = 0.5
    val h = hist(2, 3, 1, 0.001953125, 0, Seq(1 -> 1.0, 2 -> 1.0), Nil)
    assert(math.abs(eval(quantile(lit(0.5), h)) - math.sqrt(2.0)) < 1e-12)
    assert(eval(quantile(lit(1.0), h)) === 2.0)
  }

  test("fraction: full, aligned, and straddling ranges") {
    assert(eval(fraction(0.5, 8.0, posOnly)) === 1.0)
    assert(eval(fraction(1.0, 4.0, posOnly)) === 0.3) // (0.5,1] excluded, (2,4] included
    val f = eval(fraction(3.0, 6.0, posOnly))
    val l2 = (x: Double) => math.log(x) / math.log(2.0)
    val expect = ((5 + 5 * (l2(6) - 2)) - (2 + 3 * (l2(3) - 1))) / 10.0
    assert(math.abs(f - expect) < 1e-12)
  }

  test("fraction: negative range straddling a bucket") {
    // [-2,-1):3 at idx 1, [-4,-2):1 at idx 2 — cnt 4
    val h = hist(4, -8, 0, 0.001953125, 0, Nil, Seq(1 -> 3.0, 2 -> 1.0))
    // v = -2^1.25 inside [-4,-2): obs ≤ v is the (2-1.25) fraction of idx2
    val v = -math.pow(2.0, 1.25)
    assert(math.abs(eval(fraction(-4.0, v, h)) - 0.75 / 4.0) < 1e-12)
    // full negative span
    assert(eval(fraction(-4.0, -1.0, h)) === 1.0)
    // upper half of idx1: obs in [-2^0.5, -1) is half of its 3 observations
    assert(math.abs(eval(fraction(-math.pow(2.0, 0.5), -1.0, h)) - 1.5 / 4.0) < 1e-12)
  }

  test("fraction: zero bucket and degenerate bounds") {
    val zthr = 0.001953125
    val h = hist(8, 6, 0, zthr, 4, Seq(1 -> 4.0), Nil)
    assert(eval(fraction(0.0, 2.0, h)) === 1.0)
    assert(eval(fraction(-1.0, zthr / 2, h)) === 0.25) // half the zero bucket
    assert(eval(fraction(5.0, 3.0, h)) === 0.0) // inverted range
    assert(eval(fraction(Double.NaN, 1.0, h)).isNaN)
  }

  test("fromObservations builds exact schema-0 histograms from integer units") {
    import spark.implicits._
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 0L), ("a", 8L))
      .toDF("k", "obs")
    val h = fromObservations(df, Seq("k"), col("obs"), 100.0)
    val r = h.select(col("h.cnt"), col("h.zcnt"), col("h.hsum"), col("h.pos")).head()
    assert(r.getDouble(0) === 5.0)
    assert(r.getDouble(1) === 1.0)
    assert(r.getDouble(2) === 0.14) // (1+2+3+0+8)/100
    val buckets = r.getSeq[Row](3).map(b => b.getInt(0) -> b.getDouble(1))
    // obs 1→idx0 (0.5,1]; 2→idx1 (1,2]; 3→idx2 (2,4]; 8→idx3 (4,8]
    assert(buckets === Seq(0 -> 1.0, 1 -> 1.0, 2 -> 1.0, 3 -> 1.0))
  }

  test("merge sums bucket-wise across rows") {
    import spark.implicits._
    val df = Seq(("a", 1L), ("a", 2L), ("b", 2L), ("b", 5L), ("b", 0L))
      .toDF("k", "obs")
    val per = fromObservations(df, Seq("k"), col("obs"), 1.0)
    val merged = merge(per.withColumn("g", lit("all")), Seq("g"))
    val r = merged.select(col("h.cnt"), col("h.zcnt"), col("h.hsum"), col("h.pos")).head()
    assert(r.getDouble(0) === 5.0)
    assert(r.getDouble(1) === 1.0)
    assert(r.getDouble(2) === 10.0)
    val buckets = r.getSeq[Row](3).map(b => b.getInt(0) -> b.getDouble(1))
    // 1→idx0; 2→idx1 (×2); 5→idx3
    assert(buckets === Seq(0 -> 1.0, 1 -> 2.0, 3 -> 1.0))
    // quantile composes over the merged histogram: rank 2.5 → idx1, f=(2.5-2)/2
    val q = merged.select(quantile(lit(0.5), col("h"))).head().getDouble(0)
    assert(math.abs(q - math.pow(2.0, 0.25)) < 1e-12)
  }
}
