package graft

import org.apache.spark.sql.functions._
import graft.functions.{FreqSketchAgg, FreqSketchEntries, FreqSketchState}

/** Misra–Gries heavy-hitters sketch: error bound, heavy-hitter guarantee,
  * merge associativity, exactness when capacity covers the key space, and the
  * Spark aggregate path (partial → merge → final across partitions). */
class FreqSketchSpec extends SparkSpec {

  private def sketchOf(xs: Seq[String], cap: Int): FreqSketchState = {
    val s = new FreqSketchState(cap)
    xs.foreach(s.add(_))
    s
  }

  /** Zipf-ish stream: item i appears ~n/i times. */
  private def zipf(nItems: Int, scale: Int, seed: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    rnd.shuffle((1 to nItems).flatMap(i => Seq.fill(scale / i)(s"w$i")))
  }

  test("count error is bounded by n/(capacity+1); heavy hitters survive") {
    val xs = zipf(200, 4000, 7)
    val exact = xs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cap = 32
    val sk = sketchOf(xs, cap)
    val bound = xs.size.toLong / (cap + 1) + 1
    sk.counts.foreach { case (t, est) =>
      val ex = exact(t)
      assert(est <= ex, s"$t overestimated: $est > $ex")
      assert(ex - est <= bound, s"$t error ${ex - est} exceeds $bound")
    }
    // every item with true frequency > n/(cap+1) must be present
    exact.filter(_._2 > bound).keys.foreach { t =>
      assert(sk.counts.contains(t), s"heavy hitter $t evicted")
    }
  }

  test("merge is associative up to the shared guarantee; exact when wide") {
    val a = zipf(50, 1000, 1); val b = zipf(50, 1000, 2); val c = zipf(50, 1000, 3)
    val all = a ++ b ++ c
    val exact = all.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    // capacity ≥ distinct items ⇒ trim never fires ⇒ exact regardless of order
    Seq(Seq(a, b, c), Seq(c, a, b), Seq(b, c, a)).foreach { order =>
      val m = new FreqSketchState(64)
      order.foreach(part => m.merge(sketchOf(part, 64)))
      assert(m.counts.toMap == exact)
    }
    // lossy regime still honors the bound after merging
    val m = new FreqSketchState(16)
    Seq(a, b, c).foreach(part => m.merge(sketchOf(part, 16)))
    val bound = all.size.toLong / 17 * 3 + 3 // one n_i/(cap+1) slack per merge
    m.counts.foreach { case (t, est) =>
      assert(est <= exact(t) && exact(t) - est <= bound)
    }
  }

  test("serialization round-trips") {
    val sk = sketchOf(zipf(40, 500, 11), 24)
    val back = FreqSketchState.fromBytes(sk.toBytes)
    assert(back.counts == sk.counts && back.capacity == sk.capacity)
  }

  test("Spark aggregate: partial sketches merge to exact counts when wide") {
    val xs = zipf(30, 600, 5)
    val exact = xs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val df = spark.createDataFrame(xs.map(Tuple1(_))).toDF("token")
      .repartition(8) // force real partial → merge → final
    val got = df.agg(FreqSketchAgg(col("token"), 64).as("sk"))
      .select(explode(FreqSketchEntries(col("sk"))).as("e"))
      .select(col("e.token"), col("e.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exact)
  }
}
