package graft

import scala.util.Random
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.promql.{Compiler, Parser}

/** Differential fuzz for the histogram rate family: seeded random
  * histogram series (bucket-level random walks with occasional partial
  * resets — the adversarial case where one bucket shrinks while the total
  * grows) evaluated by the compiled windowDelta/extrapolation path AND by a
  * naive Scala fold that shares no engine code. Counts and sums must agree
  * within 1e-9. */
class PromqlHistogramFuzzSpec extends SparkSpec {

  private case class HSample(uid: String, ts: Long, zcnt: Double,
                             pos: Map[Int, Double], hsum: Double) {
    def cnt: Double = zcnt + pos.values.sum
  }

  private def gen(seed: Int): Seq[HSample] = {
    val r = new Random(seed)
    (1 to 3).flatMap { u =>
      var pos = (0 to 3).map(i => i -> (1 + r.nextInt(5)).toDouble).toMap
      var zc = r.nextInt(3).toDouble
      var hsum = r.nextDouble() * 10
      val tss = Seq.fill(30)(1000L + r.nextInt(400) * 1000L).distinct.sorted
      tss.map { ts =>
        if (r.nextInt(10) == 0) { // full or partial reset
          pos = pos.map { case (i, _) => i -> (if (r.nextBoolean()) 1.0 else r.nextInt(3).toDouble) }
          zc = r.nextInt(2).toDouble
          hsum = r.nextDouble()
        } else {
          pos = pos.map { case (i, c) => i -> (c + r.nextInt(3)) }
          if (r.nextInt(4) == 0) pos = pos + ((4 + r.nextInt(2)) -> 1.0) // new bucket
          zc += r.nextInt(2)
          hsum += r.nextDouble() * 5
        }
        HSample(u.toString, ts, zc, pos.filter(_._2 > 0), hsum)
      }
    }
  }

  // ---------------- naive evaluator (plain Scala, no engine code)
  private def reset(p: HSample, c: HSample): Boolean =
    c.cnt < p.cnt || c.zcnt < p.zcnt ||
      p.pos.exists { case (i, v) => c.pos.getOrElse(i, 0.0) < v }

  /** (count, sum) of fn over the window, or None when < 2 points. */
  private def naive(ss: Seq[HSample], fn: String, t: Long, w: Long): Option[(Double, Double)] = {
    val pts = ss.filter(s => s.ts > t - w && s.ts <= t).sortBy(_.ts)
    if (pts.size < 2) return None
    val (first, last) = (pts.head, pts.last)
    var adjC = 0.0; var adjS = 0.0
    if (fn != "delta") pts.sliding(2).foreach {
      case Seq(a, b) => if (reset(a, b)) { adjC += a.cnt; adjS += a.hsum }
      case _ => ()
    }
    val dC = last.cnt - first.cnt + adjC
    val dS = last.hsum - first.hsum + adjS
    val ds0 = (first.ts - (t - w)) / 1000.0
    val de0 = (t - last.ts) / 1000.0
    val si = (last.ts - first.ts) / 1000.0
    val ai = si / (pts.size - 1)
    val thr = ai * 1.1
    val dsA = if (ds0 >= thr) ai / 2.0 else ds0
    val deA = if (de0 >= thr) ai / 2.0 else de0
    val f0 = (si + dsA + deA) / si
    val f = if (fn == "rate") f0 / (w / 1000.0) else f0
    Some((dC * f, dS * f))
  }

  private val bucketT = ArrayType(StructType(Seq(
    StructField("idx", IntegerType), StructField("c", DoubleType))))
  private val hT = StructType(Seq(
    StructField("cnt", DoubleType), StructField("hsum", DoubleType),
    StructField("sch", IntegerType), StructField("zthr", DoubleType),
    StructField("zcnt", DoubleType), StructField("pos", bucketT),
    StructField("neg", bucketT),
    StructField("cb", ArrayType(DoubleType))))

  test("30 seeded random histogram rate/increase/delta agree with the naive fold") {
    val ss = gen(1234)
    val rows = ss.zipWithIndex.map { case (s, i) =>
      Row("m", s.uid, s.ts, i.toLong, 1.0, s.uid.toLong,
        Row(s.cnt, s.hsum, 0, 0.001953125, s.zcnt,
          s.pos.toSeq.sortBy(_._1).map { case (x, c) => Row(x, c) },
          Seq.empty[Row], null))
    }
    val schema = StructType(Seq(
      StructField("__name__", StringType), StructField("uid", StringType),
      StructField("ts_ms", LongType), StructField("sample_id", LongType),
      StructField("value", DoubleType), StructField("series_hash", LongType),
      StructField("h", hT)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), schema)

    val r = new Random(99)
    val failures = (1 to 30).flatMap { i =>
      val fn = Seq("rate", "increase", "delta")(r.nextInt(3))
      val w = (30 + r.nextInt(210)) * 1000L
      val t = (50 + r.nextInt(400)) * 1000L
      val q = s"histogram_count($fn(m[${w / 1000}s]))"
      val qs = s"histogram_sum($fn(m[${w / 1000}s]))"
      def run(query: String): Map[String, Double] =
        Compiler.compile(Parser.parse(query), Compiler.Ctx(df, t, t, 1000L))
          .select(col("uid"), col("value")).collect()
          .map(x => x.getString(0) -> x.getDouble(1)).toMap
      val gotC = run(q); val gotS = run(qs)
      val expected = ss.groupBy(_.uid).view.mapValues(naive(_, fn, t, w)).toMap
      expected.toSeq.flatMap { case (uid, exp) =>
        (exp, gotC.get(uid), gotS.get(uid)) match {
          case (None, None, None) => Nil
          case (Some((ec, es)), Some(gc), Some(gs))
            if math.abs(ec - gc) < 1e-9 && math.abs(es - gs) < 1e-9 => Nil
          case other => Seq(s"case $i $fn w=${w / 1000}s t=${t / 1000}s uid=$uid: " +
            s"expected $exp got count=${gotC.get(uid)} sum=${gotS.get(uid)}")
        }
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
