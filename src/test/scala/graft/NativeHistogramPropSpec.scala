package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.promql.NativeHistograms._

/** Randomized invariants for the native-histogram math (seeded — the
  * property-test analog of the reference's Prometheus differential corpus):
  * quantile is monotone in φ and attains the exact bucket bounds at φ=0/1,
  * fraction is additive over adjacent ranges and normalizes to 1, and
  * fraction inverts quantile (rank round-trip) everywhere mass exists. */
class NativeHistogramPropSpec extends SparkSpec {

  private case class H(sch: Int, zcnt: Double, pos: Seq[(Int, Double)], neg: Seq[(Int, Double)]) {
    def cnt: Double = zcnt + pos.map(_._2).sum + neg.map(_._2).sum
    def w: Double = math.pow(2.0, -sch)
    // value-order extremes (Prometheus bucket bounds, sign-clamped zero bucket)
    def lowestBound: Double =
      if (neg.nonEmpty) -math.pow(2.0, neg.map(_._1).max * w)
      else if (zcnt > 0) { if (pos.nonEmpty) 0.0 else -ZT } // sign clamp
      else math.pow(2.0, (pos.map(_._1).min - 1) * w)
    def highestBound: Double =
      if (pos.nonEmpty) math.pow(2.0, pos.map(_._1).max * w)
      else if (zcnt > 0) { if (neg.nonEmpty) 0.0 else ZT }
      else -math.pow(2.0, (neg.map(_._1).min - 1) * w)
  }
  private val ZT = 0.001953125

  private def gen(seed: Int): Seq[H] = {
    val r = new scala.util.Random(seed)
    Seq.fill(60) {
      val sch = r.nextInt(3) - 1 // {-1, 0, 1}: w ∈ {2, 1, 0.5}
      // Prometheus invariant: no exponential bucket overlaps the zero
      // bucket — lowest bucket bound 2^((idx-1)·w) must be ≥ zthr = 2^-9
      val w = math.pow(2.0, -sch)
      val minIdx = math.ceil(1.0 - 9.0 / w).toInt
      def side(maxN: Int): Seq[(Int, Double)] =
        r.shuffle((minIdx max -4 to 8).toList).take(r.nextInt(maxN))
          .map(i => i -> (1 + r.nextInt(20)).toDouble).sortBy(_._1)
      val pos = side(6)
      val neg = if (r.nextBoolean()) side(3) else Nil
      val zcnt = if (r.nextBoolean()) r.nextInt(6).toDouble else 0.0
      val h = H(sch, zcnt, pos, neg)
      if (h.cnt == 0) H(sch, 1.0, pos, neg) else h // keep cnt > 0
    }
  }

  private val bucketT = ArrayType(StructType(Seq(
    StructField("idx", IntegerType), StructField("c", DoubleType))))
  private val hT = StructType(Seq(
    StructField("cnt", DoubleType), StructField("hsum", DoubleType),
    StructField("sch", IntegerType), StructField("zthr", DoubleType),
    StructField("zcnt", DoubleType), StructField("pos", bucketT),
    StructField("neg", bucketT),
    StructField("cb", ArrayType(DoubleType))))

  test("merge add/sub invariants over 60 random histograms") {
    // the machinery behind h+h / h-h binop arithmetic: doubling via the
    // group merge must equal uniform scaling BIT-EXACTLY (c+c == 2c in
    // IEEE), and subtracting a histogram from itself must compact to the
    // zero histogram (a-a == 0 exactly; empty buckets pruned like
    // FloatHistogram.Compact)
    val hs = gen(7)
    def row(i: Int, h: H, f: Double) =
      Row(i, Row(h.cnt * f, h.cnt * 1.5 * f, h.sch, ZT, h.zcnt * f,
        h.pos.map { case (x, c) => Row(x, c * f) },
        h.neg.map { case (x, c) => Row(x, c * f) }, null))
    val schema = StructType(Seq(StructField("id", IntegerType), StructField("h", hT)))
    def df(rows: Seq[Row]) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)

    val doubled = graft.promql.NativeHistograms.merge(
        df(hs.zipWithIndex.flatMap { case (h, i) => Seq(row(i, h, 1.0), row(i, h, 1.0)) }),
        Seq("id")).orderBy(col("id")).collect().toSeq
    val scaled = df(hs.zipWithIndex.map { case (h, i) => row(i, h, 2.0) })
      .orderBy(col("id")).collect().toSeq
    assert(doubled == scaled, "merge-of-two != scale-by-2")

    val cancelled = graft.promql.NativeHistograms.merge(
        df(hs.zipWithIndex.flatMap { case (h, i) => Seq(row(i, h, 1.0), row(i, h, -1.0)) }),
        Seq("id")).orderBy(col("id")).collect().toSeq
    cancelled.foreach { r =>
      val h = r.getStruct(1)
      assert(h.getDouble(0) == 0.0 && h.getDouble(1) == 0.0 &&
        h.getDouble(4) == 0.0 && h.getSeq[Row](5).isEmpty && h.getSeq[Row](6).isEmpty,
        s"h - h did not compact to zero: $h")
    }
  }

  test("quantile/fraction invariants over 60 random histograms") {
    val hs = gen(42)
    val rows = hs.zipWithIndex.map { case (h, i) =>
      Row(i, Row(h.cnt, h.cnt * 1.5, h.sch, ZT, h.zcnt,
        h.pos.map { case (x, c) => Row(x, c) },
        h.neg.map { case (x, c) => Row(x, c) }, null))
    }
    val schema = StructType(Seq(StructField("id", IntegerType), StructField("h", hT)))
    val d = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)

    val phis = (0 to 10).map(_ / 10.0)
    val out = d.select(
      col("id"),
      array(phis.map(p => quantile(lit(p), col("h"))): _*).as("qs"),
      fractionWithLogs(lit(-1048576.0), lit(20.0), lit(1048576.0), lit(20.0), col("h")).as("full"),
      // additivity at fixed interior cuts
      fraction(-1048576.0, 1.5, col("h")).as("fa"),
      fraction(1.5, 1048576.0, col("h")).as("fb"),
      // inverse property: fraction up to quantile(φ) == φ
      array(phis.filter(p => p > 0 && p < 1).map { p =>
        val q = quantile(lit(p), col("h"))
        fractionWithLogs(lit(-1048576.0), lit(20.0), q,
          log(2.0, abs(q)), col("h"))
      }: _*).as("inv")
    ).collect().map(r => (r.getInt(0), r.getSeq[Double](1), r.getDouble(2),
      r.getDouble(3), r.getDouble(4), r.getSeq[Double](5))).toSeq

    out.foreach { case (i, qs, full, fa, fb, inv) =>
      val h = hs(i)
      // monotone in φ
      qs.sliding(2).foreach {
        case Seq(a, b) => assert(a <= b + 1e-9, s"hist $i: quantile not monotone: $qs")
        case _ => () }
      // exact bounds at the ends
      assert(math.abs(qs.head - h.lowestBound) < 1e-9,
        s"hist $i: q(0)=${qs.head} want ${h.lowestBound}")
      assert(math.abs(qs.last - h.highestBound) < 1e-9,
        s"hist $i: q(1)=${qs.last} want ${h.highestBound}")
      // fraction normalizes and is additive
      assert(math.abs(full - 1.0) < 1e-9, s"hist $i: full=$full")
      assert(math.abs(fa + fb - 1.0) < 1e-9, s"hist $i: $fa + $fb != 1")
      // rank round-trip wherever mass exists
      inv.zip(phis.filter(p => p > 0 && p < 1)).foreach { case (f, p) =>
        assert(math.abs(f - p) < 1e-6, s"hist $i: fraction(q($p))=$f") }
    }
  }

  test("windowDelta of a monotone pair is the bucket-wise growth") {
    val r = new scala.util.Random(7)
    val hs = gen(7).take(20)
    val rows = hs.zipWithIndex.map { case (h, i) =>
      val growth = h.pos.map { case (x, c) => (x, (1 + r.nextInt(5)).toDouble) }
      val h2pos = h.pos.map { case (x, c) =>
        (x, c + growth.find(_._1 == x).map(_._2).getOrElse(0.0)) }
      val gSum = growth.map(_._2).sum
      Row(i,
        Seq(Row(1000L, 1L, Row(h.cnt, 1.0, h.sch, ZT, h.zcnt,
              h.pos.map { case (x, c) => Row(x, c) },
              h.neg.map { case (x, c) => Row(x, c) }, null)),
            Row(2000L, 2L, Row(h.cnt + gSum, 2.0, h.sch, ZT, h.zcnt,
              h2pos.map { case (x, c) => Row(x, c) },
              h.neg.map { case (x, c) => Row(x, c) }, null))),
        gSum)
    }
    val ptT = ArrayType(StructType(Seq(
      StructField("ts_ms", LongType), StructField("sample_id", LongType),
      StructField("h", hT))))
    val schema = StructType(Seq(StructField("id", IntegerType),
      StructField("pts", ptT), StructField("gsum", DoubleType)))
    val d = spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), schema)
    val out = d.select(col("id"), col("gsum"),
        windowDelta(col("pts"), isCounter = true).as("delta"))
      .select(col("id"), col("gsum"), col("delta.cnt").as("dc"),
        size(col("delta.neg")).as("dn")).collect()
    out.foreach { r =>
      assert(r.getDouble(2) === r.getDouble(1), s"hist ${r.getInt(0)}: cnt delta")
      assert(r.getInt(3) === 0) // no negative-bucket growth → empty delta
    }
  }
}
