package graft

import scala.util.Random
import graft.model.TimeSeriesModel
import graft.promql.{Compiler, Parser}
import graft.sources.Tables

/** Differential fuzzing (ref `FuzzConverter`, db/db_test.go:1129-1205:
  * promqlsmith-generated queries, parquet vs TSDB). Here: seeded random
  * PromQL instant queries evaluated by the Catalyst compiler AND by an
  * independent naive in-memory evaluator; results must agree within 1e-9.
  * The naive evaluator shares no code with the engine — it folds over
  * collected samples with plain Scala collections. */
class PromqlFuzzSpec extends SparkSpec {

  private val DAY = 86400000L
  private val T0 = 1704067200000L

  // in-memory copy of the fixture: (name, uid, ts, value)
  private lazy val mem: Seq[(String, String, Long, Double)] = {
    val t = Tables(spark, sf())
    TimeSeriesModel.samples(t.events)
      .collect().toSeq
      .map(r => (r.getAs[String]("__name__"), r.getAs[String]("uid"),
        r.getAs[Long]("ts_ms"), r.getAs[Double]("value")))
  }
  private lazy val samples = TimeSeriesModel.samples(Tables(spark, sf()).events)

  // ---------------- naive reference evaluator (collections only)
  private def naiveInstant(nameRe: Option[String], uidEq: Option[String],
                           uidNotRe: Option[String], t: Long, lb: Long): Map[(String, String), Double] =
    mem
      .filter { case (n, u, ts, _) =>
        ts > t - lb && ts <= t &&
          nameRe.forall(re => n.matches("^(?:" + re + ")$")) &&
          uidEq.forall(_ == u) &&
          uidNotRe.forall(re => !u.matches("^(?:" + re + ")$"))
      }
      .groupBy(s => (s._1, s._2))
      .map { case (k, ss) => k -> ss.maxBy(_._3)._4 }

  private def naiveAgg(op: String, byName: Boolean,
                       v: Map[(String, String), Double]): Map[String, Double] = {
    val grouped = v.groupBy { case ((n, u), _) => if (byName) n else u }
    grouped.map { case (k, m) =>
      val xs = m.values.toSeq.sorted // deterministic fold order
      k -> (op match {
        case "sum"   => xs.sum
        case "avg"   => xs.sum / xs.size
        case "min"   => xs.min
        case "max"   => xs.max
        case "count" => xs.size.toDouble
      })
    }
  }

  test("70 seeded random aggregation queries (incl offset/@) agree with the naive evaluator") {
    val rnd = new Random(42)
    val names = Seq("click", "view", "purchase", "signup", "error")
    val failures = (1 to 70).flatMap { i =>
      val op = Seq("sum", "avg", "min", "max", "count")(rnd.nextInt(5))
      val byName = rnd.nextBoolean()
      val nameRe = if (rnd.nextBoolean()) Some(names(rnd.nextInt(5)) + "|" + names(rnd.nextInt(5)))
                   else Some(names(rnd.nextInt(5)).take(2) + ".*")
      val uidEq = if (rnd.nextInt(4) == 0) Some(rnd.nextInt(15).toString) else None
      val uidNotRe = if (uidEq.isEmpty && rnd.nextInt(3) == 0) Some("1.*") else None
      val t = T0 + (5 + rnd.nextInt(20)) * DAY + rnd.nextInt(86400) * 1000L
      val lb = Seq(6L, 12L, 24L, 48L).map(_ * 3600000L)(rnd.nextInt(4))
      // modifiers: the naive side just evaluates at the shifted instant
      val offH = if (rnd.nextInt(3) == 0) Some(Seq(1L, 6L, 24L)(rnd.nextInt(3))) else None
      val atT = if (rnd.nextInt(3) == 0)
        Some(T0 + (5 + rnd.nextInt(20)) * DAY + rnd.nextInt(86400) * 1000L) else None

      val matchers = Seq(s"""__name__=~"${nameRe.get}"""") ++
        uidEq.map(u => s"""uid="$u"""") ++ uidNotRe.map(re => s"""uid!~"$re"""")
      val grouping = if (byName) "__name__" else "uid"
      val mods = offH.map(h => s" offset ${h}h").getOrElse("") +
        atT.map(a => s" @ ${a / 1000}").getOrElse("")
      val q = s"$op by ($grouping) ({${matchers.mkString(", ")}}$mods)"
      val tEff = atT.getOrElse(t) - offH.getOrElse(0L) * 3600000L

      val engine = Compiler.compile(Parser.parse(q),
          Compiler.Ctx(samples, t, t, 1000L, lb))
        .collect().map(r => r.getAs[String](grouping) ->
          (r.getAs[Any]("value") match { case d: Double => d; case l: Long => l.toDouble }))
        .toMap
      val naive = naiveAgg(op, byName, naiveInstant(nameRe, uidEq, uidNotRe, tEff, lb))

      val ok = engine.keySet == naive.keySet && naive.forall { case (k, v) =>
        math.abs(engine(k) - v) <= 1e-9 * math.max(1.0, math.abs(v))
      }
      if (ok) None
      else Some(s"#$i  $q @$t lb=$lb\n  engine=$engine\n  naive =$naive")
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("40 seeded random *_over_time window queries agree with the naive evaluator") {
    val rnd = new Random(11)
    val names = Seq("click", "view", "purchase", "signup", "error")
    val ops = Seq("sum", "avg", "min", "max", "count", "stddev", "first", "last",
      "ts_of_max", "ts_of_min", "ts_of_last")
    val failures = (1 to 40).flatMap { i =>
      val op = ops(rnd.nextInt(ops.length))
      val name = names(rnd.nextInt(5))
      val t = T0 + (5 + rnd.nextInt(20)) * DAY + rnd.nextInt(86400) * 1000L
      val wH = Seq(1L, 6L, 24L, 48L)(rnd.nextInt(4))
      val offH = if (rnd.nextInt(3) == 0) Seq(1L, 12L)(rnd.nextInt(2)) else 0L
      val off = if (offH == 0) "" else s" offset ${offH}h"
      val q = s"""${op}_over_time({__name__="$name"}[${wH}h]$off)"""

      val engine = Compiler.compile(Parser.parse(q),
          Compiler.Ctx(samples, t, t, 1000L, DAY))
        .collect().map(r => r.getAs[String]("uid") ->
          r.getAs[Double]("value")).toMap

      val tE = t - offH * 3600000L
      val w = wH * 3600000L
      val naive = mem
        .filter { case (n, _, ts, _) => n == name && ts > tE - w && ts <= tE }
        .groupBy(_._2)
        .map { case (u, ss) =>
          val sorted = ss.sortBy(_._3)
          val xs = sorted.map(_._4).sorted // deterministic fold order
          u -> (op match {
            case "sum"    => xs.sum
            case "avg"    => xs.sum / xs.size
            case "min"    => xs.min
            case "max"    => xs.max
            case "count"  => xs.size.toDouble
            case "stddev" => // population stddev about the window mean
              val m = xs.sum / xs.size
              math.sqrt(xs.map(x => (x - m) * (x - m)).sum / xs.size)
            case "first"  => sorted.head._4
            case "last"   => sorted.last._4
            // Prometheus funcTsOfMax/Min: >=/<= walk in ts order, later wins
            case "ts_of_max" =>
              sorted.foldLeft(sorted.head) { (b, s) => if (s._4 >= b._4) s else b }._3 / 1000.0
            case "ts_of_min" =>
              sorted.foldLeft(sorted.head) { (b, s) => if (s._4 <= b._4) s else b }._3 / 1000.0
            case "ts_of_last" => sorted.last._3 / 1000.0
          })
        }
      val ok = engine.keySet == naive.keySet && naive.forall { case (k, v) =>
        math.abs(engine(k) - v) <= 1e-9 * math.max(1.0, math.abs(v))
      }
      if (ok) None
      else Some(s"#$i  $q @$t\n  engine=$engine\n  naive =$naive")
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("30 seeded random rate/increase/delta queries agree with naive extrapolatedRate") {
    // independent reimplementation of Prometheus extrapolatedRate
    // (promql/functions.go) over plain collections — shares nothing with
    // Compiler.extrapolated
    def naiveExtrapolated(pts0: Seq[(Long, Double)], tMs: Long, wMs: Long,
                          isCounter: Boolean, isRate: Boolean): Option[Double] = {
      val pts = pts0.sortBy(_._1)
      if (pts.length < 2) return None
      val (firstT, firstV) = pts.head
      val (lastT, lastV) = pts.last
      var rf = lastV - firstV
      if (isCounter) {
        var prev = firstV
        pts.tail.foreach { case (_, v) => if (v < prev) rf += prev; prev = v }
      }
      val rangeStart = (tMs - wMs).toDouble
      var durToStart = firstT - rangeStart
      var durToEnd = tMs.toDouble - lastT
      val sampled = (lastT - firstT).toDouble
      val avgBetween = sampled / (pts.length - 1)
      val threshold = avgBetween * 1.1
      if (durToStart >= threshold) durToStart = avgBetween / 2
      if (isCounter && rf > 0 && firstV >= 0) {
        val durToZero = sampled * (firstV / rf)
        if (durToZero < durToStart) durToStart = durToZero
      }
      if (durToEnd >= threshold) durToEnd = avgBetween / 2
      var factor = (sampled + durToStart + durToEnd) / sampled
      if (isRate) factor /= wMs / 1000.0
      Some(rf * factor)
    }

    val rnd = new Random(23)
    val names = Seq("click", "view", "purchase", "signup", "error")
    val failures = (1 to 30).flatMap { i =>
      val fn = Seq("rate", "increase", "delta")(rnd.nextInt(3))
      val name = names(rnd.nextInt(5))
      val t = T0 + (5 + rnd.nextInt(20)) * DAY + rnd.nextInt(86400) * 1000L
      val wH = Seq(6L, 12L, 24L, 48L)(rnd.nextInt(4))
      val w = wH * 3600000L
      val q = s"""$fn({__name__="$name"}[${wH}h])"""

      val engine = Compiler.compile(Parser.parse(q),
          Compiler.Ctx(samples, t, t, 1000L, DAY))
        .collect().map(r => r.getAs[String]("uid") -> r.getAs[Double]("value")).toMap
      val naive = mem
        .filter { case (n, _, ts, _) => n == name && ts > t - w && ts <= t }
        .groupBy(_._2)
        .flatMap { case (u, ss) =>
          naiveExtrapolated(ss.map(s => (s._3, s._4)), t, w,
            isCounter = fn != "delta", isRate = fn == "rate").map(u -> _)
        }
      val ok = engine.keySet == naive.keySet && naive.forall { case (k, v) =>
        math.abs(engine(k) - v) <= 1e-9 * math.max(1.0, math.abs(v))
      }
      if (ok) None
      else Some(s"#$i  $q @$t\n  engine=$engine\n  naive =$naive")
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("30 seeded random deriv/predict_linear/smoothing queries agree with the naive evaluator") {
    // independent reimplementations over plain collections: least squares
    // as Prometheus' linearRegression (promql/functions.go — x relative to
    // a reference ts, intercept at that ts) and the double-exponential
    // smoothing recursion exactly as funcDoubleExponentialSmoothing orders
    // its trend/level updates. Shares nothing with the engine's
    // window-relative moment formulation.
    def linReg(pts: Seq[(Long, Double)], tRefMs: Long): (Double, Double) = {
      val xs = pts.map(p => (p._1 - tRefMs) / 1000.0)
      val ys = pts.map(_._2)
      val n = pts.length
      val sx = xs.sum; val sy = ys.sum
      val sxx = xs.map(x => x * x).sum
      val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      (slope, sy / n - slope * sx / n)
    }
    def naiveDexp(vs: Seq[Double], sf: Double, tf: Double): Option[Double] = {
      if (vs.length < 2) return None
      var s0 = 0.0; var s1 = vs(0)
      var b = vs(1) - vs(0)
      for (i <- 1 until vs.length) {
        val x = sf * vs(i)
        if (i > 1) b = tf * (s1 - s0) + (1 - tf) * b
        val y = (1 - sf) * (s1 + b)
        s0 = s1; s1 = x + y
      }
      Some(s1)
    }
    val rnd = new Random(57)
    val names = Seq("click", "view", "purchase", "signup", "error")
    val failures = (1 to 30).flatMap { i =>
      val kind = rnd.nextInt(3)
      val name = names(rnd.nextInt(5))
      val t = T0 + (5 + rnd.nextInt(20)) * DAY + rnd.nextInt(86400) * 1000L
      val wH = Seq(6L, 12L, 24L, 48L)(rnd.nextInt(4))
      val w = wH * 3600000L
      val aheadS = Seq(-3600L, 0L, 1800L, 7200L)(rnd.nextInt(4))
      val (q, naiveOf) = kind match {
        case 0 => (s"""deriv({__name__="$name"}[${wH}h])""",
          (pts: Seq[(Long, Double)]) =>
            if (pts.length < 2) None
            else Some(linReg(pts, pts.head._1)._1))
        case 1 => (s"""predict_linear({__name__="$name"}[${wH}h], $aheadS)""",
          (pts: Seq[(Long, Double)]) =>
            if (pts.length < 2) None
            else { val (sl, ic) = linReg(pts, t); Some(ic + sl * aheadS) })
        case _ => (s"""double_exponential_smoothing({__name__="$name"}[${wH}h], 0.2, 0.4)""",
          (pts: Seq[(Long, Double)]) => naiveDexp(pts.map(_._2), 0.2, 0.4))
      }
      val engine = Compiler.compile(Parser.parse(q),
          Compiler.Ctx(samples, t, t, 1000L, DAY))
        .collect().map(r => r.getAs[String]("uid") -> r.getAs[Double]("value")).toMap
      val naive = mem
        .filter { case (n, _, ts, _) => n == name && ts > t - w && ts <= t }
        .groupBy(_._2)
        .flatMap { case (u, ss) =>
          naiveOf(ss.map(s => (s._3, s._4)).sortBy(_._1)).map(u -> _)
        }
      // different (but both exact) formulations of the same least squares:
      // engine moments are window-relative, naive x is reference-relative —
      // agreement to 1e-6 relative is the conditioning-aware bound
      val ok = engine.keySet == naive.keySet && naive.forall { case (k, v) =>
        math.abs(engine(k) - v) <= 1e-6 * math.max(1.0, math.abs(v))
      }
      if (ok) None
      else Some(s"#$i  $q @$t\n  engine=$engine\n  naive =$naive")
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("25 seeded random subquery windows agree with the naive evaluator (step alignment)") {
    // Prometheus evaluates subquery steps at absolute multiples of the
    // resolution (promql/eval.go aligns the inner start timestamp), and the
    // outer range selection is left-open: steps s ≡ 0 (mod res), t−R < s ≤ t.
    val rnd = new Random(31)
    val names = Seq("click", "view", "purchase", "signup", "error")
    val ops = Seq("sum", "count", "max", "last")
    val failures = (1 to 25).flatMap { i =>
      val op = ops(rnd.nextInt(ops.length))
      val name = names(rnd.nextInt(5))
      // deliberately unaligned t (second granularity, odd offsets)
      val t = T0 + (5 + rnd.nextInt(20)) * DAY + (rnd.nextInt(86400) * 1000L + 1000L)
      val rH = Seq(6L, 12L, 24L)(rnd.nextInt(3))
      val r = rH * 3600000L
      val resS = Seq(300L, 420L, 600L)(rnd.nextInt(3)) // 5m / 7m / 10m
      val res = resS * 1000L
      val lb = DAY
      val q = s"""${op}_over_time({__name__="$name"}[${rH}h:${resS}s])"""

      val engine = Compiler.compile(Parser.parse(q),
          Compiler.Ctx(samples, t, t, 1000L, lb))
        .collect().map(r => r.getAs[String]("uid") -> r.getAs[Double]("value")).toMap

      // inner instant values at aligned steps, then the outer fold
      val sLo = (t - r) / res * res // last multiple ≤ t−R; first step is the next
      val steps = Iterator.iterate(sLo + res)(_ + res).takeWhile(_ <= t).toSeq
        .filter(_ > t - r)
      val naive = mem.filter(_._1 == name).groupBy(_._2).flatMap { case (u, ss) =>
        val pts = steps.flatMap { s =>
          val in = ss.filter(p => p._3 > s - lb && p._3 <= s)
          if (in.isEmpty) None else Some(in.maxBy(_._3)._4)
        }
        if (pts.isEmpty) None
        else Some(u -> (op match {
          case "sum"   => pts.sorted.sum
          case "count" => pts.size.toDouble
          case "max"   => pts.max
          case "last"  => pts.last
        }))
      }
      val ok = engine.keySet == naive.keySet && naive.forall { case (k, v) =>
        math.abs(engine(k) - v) <= 1e-9 * math.max(1.0, math.abs(v))
      }
      if (ok) None
      else Some(s"#$i  $q @$t\n  engine=$engine\n  naive =$naive")
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("40 seeded random binop/set-op queries agree with the naive evaluator") {
    val rnd = new Random(53)
    val names = Seq("click", "view", "purchase", "signup", "error")
    val failures = (1 to 40).flatMap { i =>
      val (a, b) = (names(rnd.nextInt(5)), names(rnd.nextInt(5)))
      val t = T0 + (5 + rnd.nextInt(20)) * DAY + rnd.nextInt(86400) * 1000L
      val lb = DAY
      val va = naiveInstant(Some(a), None, None, t, lb).map { case ((_, u), v) => u -> v }
      val vb = naiveInstant(Some(b), None, None, t, lb).map { case ((_, u), v) => u -> v }

      val kind = rnd.nextInt(4)
      val (q, naive): (String, Map[String, Double]) = kind match {
        case 0 => // arithmetic, matched on(uid)
          val op = Seq("+", "-", "*", "/", "%")(rnd.nextInt(5))
          val f: (Double, Double) => Double = op match {
            case "+" => _ + _; case "-" => _ - _; case "*" => _ * _
            case "/" => _ / _
            case "%" => (x, y) => x % y // IEEE remainder-with-sign-of-dividend
          }
          (s"""{__name__="$a"} $op on(uid) {__name__="$b"}""",
            va.flatMap { case (u, x) => vb.get(u).map(y => u -> f(x, y)) })
        case 1 => // comparison filter: keeps lhs value on matching series
          val op = Seq(">", "<", ">=", "<=")(rnd.nextInt(4))
          val f: (Double, Double) => Boolean = op match {
            case ">" => _ > _; case "<" => _ < _; case ">=" => _ >= _; case "<=" => _ <= _
          }
          (s"""{__name__="$a"} $op on(uid) {__name__="$b"}""",
            va.flatMap { case (u, x) => vb.get(u).filter(y => f(x, y)).map(_ => u -> x) })
        case 2 => // comparison with bool: 0/1 on every matched pair
          val op = Seq(">", "<=")(rnd.nextInt(2))
          val f: (Double, Double) => Boolean =
            if (op == ">") _ > _ else _ <= _
          (s"""{__name__="$a"} $op bool on(uid) {__name__="$b"}""",
            va.flatMap { case (u, x) =>
              vb.get(u).map(y => u -> (if (f(x, y)) 1.0 else 0.0)) })
        case 3 => // set ops on(uid): and keeps lhs ∩ rhs, unless keeps lhs ∖ rhs
          val op = Seq("and", "unless")(rnd.nextInt(2))
          (s"""{__name__="$a"} $op on(uid) {__name__="$b"}""",
            if (op == "and") va.filter { case (u, _) => vb.contains(u) }
            else va.filter { case (u, _) => !vb.contains(u) })
      }

      val engine = Compiler.compile(Parser.parse(q),
          Compiler.Ctx(samples, t, t, 1000L, lb))
        .collect().map(r => r.getAs[String]("uid") -> r.getAs[Double]("value")).toMap
      val ok = engine.keySet == naive.keySet && naive.forall { case (k, v) =>
        math.abs(engine(k) - v) <= 1e-12 * math.max(1.0, math.abs(v))
      }
      if (ok) None
      else Some(s"#$i  $q @$t\n  engine=$engine\n  naive =$naive")
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("seeded 1:1 vector-matching fuzz vs a naive engine.go VectorBinop (duplicate errors included)") {
    // The r19 rework of 1:1 matching (union-of-labels signatures, pre-join
    // rhs dup guard, matched-only lhs sentinel, static coverage skip) is
    // fuzzed here against a from-scratch transcription of Prometheus'
    // VectorBinop loop: rightSigs duplicate → error regardless of matching;
    // two lhs samples reaching one rhs sample → error; unmatched lhs
    // duplicates pass silently; arithmetic keeps the signature labels,
    // filter-form comparisons keep the full lhs labelset.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new Random(191)
    val T = 600000L
    // all label sets over keys a, b with values v0/v1 or absent
    val pool = for {
      a <- Seq(None, Some("v0"), Some("v1"))
      b <- Seq(None, Some("v0"), Some("v1"))
    } yield (a.map("a" -> _).toMap ++ b.map("b" -> _).toMap)
    val failures = (1 to 40).flatMap { i =>
      val ls = rnd.shuffle(pool).take(1 + rnd.nextInt(4))
      val rs = rnd.shuffle(pool).take(1 + rnd.nextInt(4))
      val matching = rnd.nextInt(4) match {
        case 0 => ""
        case 1 => "on(a) "
        case 2 => "ignoring(a) "
        case 3 => "on(a, b) "
      }
      val op = Seq("+", "*", ">")(rnd.nextInt(3))
      val q = s"lm $op ${matching}rm"
      val lVals = ls.zipWithIndex.map { case (m, k) => (m, 10.0 + k) }
      val rVals = rs.zipWithIndex.map { case (m, k) => (m, 100.0 + k) }
      val rows = (lVals.map { case (m, v) => ("lm", m, v) } ++
        rVals.map { case (m, v) => ("rm", m, v) }).zipWithIndex.map {
        case ((n, m, v), k) =>
          (n, m.getOrElse("a", null), m.getOrElse("b", null), T, v, k.toLong)
      }
      val df = rows.toDF("__name__", "a", "b", "ts_ms", "value", "sample_id")
        .withColumn("series_hash", col("sample_id"))

      // --- naive engine.go VectorBinop (collections only)
      def sig(m: Map[String, String]): Map[String, String] = matching.trim match {
        case ""              => m
        case "on(a)"         => m.filter(_._1 == "a")
        case "ignoring(a)"   => m.filterNot(_._1 == "a")
        case "on(a, b)"      => m
      }
      def naive(): Either[String, Set[(Map[String, String], Double)]] = {
        val rightSigs = scala.collection.mutable.Map.empty[Map[String, String], Double]
        for ((m, v) <- rVals) {
          val s = sig(m)
          if (rightSigs.contains(s)) return Left("right")
          rightSigs(s) = v
        }
        val matched = scala.collection.mutable.Set.empty[Map[String, String]]
        val out = scala.collection.mutable.Set.empty[(Map[String, String], Double)]
        for ((m, lv) <- lVals) {
          val s = sig(m)
          rightSigs.get(s) match {
            case Some(rv) =>
              if (matched.contains(s)) return Left("left")
              matched += s
              op match {
                case "+" => out += ((s, lv + rv))
                case "*" => out += ((s, lv * rv))
                case ">" => if (lv > rv) out += ((m + ("__name__" -> "lm"), lv))
              }
            case None => ()
          }
        }
        Right(out.toSet)
      }

      // --- engine
      val engine: Either[String, Set[(Map[String, String], Double)]] =
        try {
          val got = Compiler.compile(Parser.parse(q),
            Compiler.Ctx(df, T, T, 1000L, 300000L)).collect().toSeq
          Right(got.map { r =>
            val lbls = Seq("__name__", "a", "b").flatMap(c =>
              if (r.schema.fieldNames.contains(c))
                Option(r.getAs[String](c)).map(c -> _)
              else None).toMap
            (lbls, r.getAs[Double]("value"))
          }.toSet)
        } catch {
          case e: Throwable =>
            val msg = String.valueOf(e.getMessage)
            if (msg.contains("right hand-side")) Left("right")
            else if (msg.contains("left hand-side")) Left("left")
            else Left(s"other: ${msg.take(120)}")
        }

      (naive(), engine) match {
        // when BOTH sides carry duplicates Prometheus deterministically
        // reports the right side (it hashes the rhs first); our two guards
        // evaluate in plan order, so either duplicate-rejection side is
        // accepted — the error/success boundary is what must agree exactly
        case (Left(a), Left(b))
          if Set("left", "right")(a) && Set("left", "right")(b) => None
        case (Right(a), Right(b)) if a == b => None
        case (n, e) => Some(s"#$i  $q\n  L=$lVals\n  R=$rVals\n  naive =$n\n  engine=$e")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("NaN-laced windows: over_time family agrees with Prometheus-walk folds") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new Random(99)
    // 8 series × 60 samples at 10 s cadence, ~20% NaN — the semantics Spark
    // gets wrong by default (NaN sorts greatest; decimal sums null it)
    val series = (0 until 8).map { i =>
      i.toString -> (0 until 60).map(j => (j * 10000L,
        if (rnd.nextInt(5) == 0) Double.NaN else rnd.nextDouble() * 100))
    }
    val df = series.flatMap { case (u, pts) => pts.map(p =>
        ("m", u, p._1, p._2, u.toLong * 100000 + p._1)) }
      .toDF("__name__", "uid", "ts_ms", "value", "sample_id")
      .withColumn("series_hash", xxhash64(col("__name__"), col("uid")))
    val win = 180000L
    def fold(w: Seq[(Long, Double)], op: String): Double = op match {
      case "sum"   => w.map(_._2).sum
      case "avg"   => w.map(_._2).sum / w.size
      case "count" => w.size.toDouble
      case "min"   => w.foldLeft(Double.NaN)((m, p) => if (p._2 < m || m.isNaN) p._2 else m)
      case "max"   => w.foldLeft(Double.NaN)((m, p) => if (p._2 > m || m.isNaN) p._2 else m)
      case "ts_of_max" => w.foldLeft((Double.NaN, 0L)) { (b, p) =>
        if (p._2 >= b._1 || b._1.isNaN) (p._2, p._1) else b }._2 / 1000.0
      case "ts_of_min" => w.foldLeft((Double.NaN, 0L)) { (b, p) =>
        if (p._2 <= b._1 || b._1.isNaN) (p._2, p._1) else b }._2 / 1000.0
    }
    val failures = for {
      op <- Seq("sum", "avg", "count", "min", "max", "ts_of_max", "ts_of_min")
      t <- Seq(200000L, 400000L, 590000L)
      q = s"""${op}_over_time({__name__="m"}[3m])"""
      engine = Compiler.compile(Parser.parse(q), Compiler.Ctx(df, t, t, 1000L, 300000L))
        .collect().map(r => r.getAs[String]("uid") -> r.getAs[Double]("value")).toMap
      naive = series.map { case (u, pts) =>
        u -> fold(pts.filter(p => p._1 > t - win && p._1 <= t), op) }.toMap
      if !(engine.keySet == naive.keySet && naive.forall { case (k, v) =>
        (v.isNaN && engine(k).isNaN) || engine(k) == v ||
          math.abs(engine(k) - v) <= 1e-9 * math.max(1.0, math.abs(v)) })
    } yield s"$op @$t\n  engine=$engine\n  naive =$naive"
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("NaN-laced comparison operators agree with IEEE/Go semantics (filter + bool)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new Random(123)
    // ~25% NaN values: Spark's total order would keep NaN for `>` and match
    // NaN == NaN — both wrong vs Prometheus (Go float comparisons are IEEE)
    val series = (0 until 10).map { i =>
      i.toString -> (0 until 40).map(j => (j * 10000L,
        if (rnd.nextInt(4) == 0) Double.NaN else rnd.nextDouble() * 100))
    }
    val df = series.flatMap { case (u, pts) => pts.map(p =>
        ("m", u, p._1, p._2, u.toLong * 100000 + p._1)) }
      .toDF("__name__", "uid", "ts_ms", "value", "sample_id")
      .withColumn("series_hash", xxhash64(col("__name__"), col("uid")))
    val (t, lb) = (250000L, 300000L)
    // instant value per series: latest sample in (t-lb, t]
    val inst = series.map { case (u, pts) =>
      u -> pts.filter(p => p._1 > t - lb && p._1 <= t).maxBy(_._1)._2 }.toMap
    // Scala Double comparisons are IEEE like Go's — a valid naive reference
    def cmp(op: String, a: Double, b: Double): Boolean = op match {
      case "==" => a == b; case "!=" => a != b; case ">" => a > b
      case "<" => a < b; case ">=" => a >= b; case "<=" => a <= b
    }
    val failures = for {
      op <- Seq("==", "!=", ">", "<", ">=", "<=")
      bool <- Seq(false, true)
      thr <- Seq(25.0, 50.0, Double.NaN)
      thrStr = if (thr.isNaN) "(0/0)" else thr.toString // NaN scalar via 0/0
      q = s"""{__name__="m"} $op${if (bool) " bool" else ""} $thrStr"""
      engine = Compiler.compile(Parser.parse(q), Compiler.Ctx(df, t, t, 1000L, lb))
        .collect().map(r => r.getAs[String]("uid") -> r.getAs[Double]("value")).toMap
      naive = if (bool) inst.map { case (u, v) => u -> (if (cmp(op, v, thr)) 1.0 else 0.0) }
              else inst.filter { case (_, v) => cmp(op, v, thr) }
      if !(engine.keySet == naive.keySet && naive.forall { case (k, v) =>
        (v.isNaN && engine(k).isNaN) || engine(k) == v })
    } yield s"$q\n  engine=$engine\n  naive =$naive"
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("random classic-histogram layouts: histogram_quantile agrees with naive bucketQuantile") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // literal Scala port of Prometheus promql/quantile.go bucketQuantile —
    // shares nothing with the engine's HOF-expression implementation
    def bucketQuantile(q: Double, buckets: Seq[(Double, Double)]): Double = {
      if (q.isNaN) Double.NaN
      else if (q < 0) Double.NegativeInfinity
      else if (q > 1) Double.PositiveInfinity
      else {
        val bs = buckets.sortBy(_._1)
        if (bs.length < 2 || !bs.last._1.isPosInfinity) Double.NaN
        else {
          val cums = bs.scanLeft(0.0)((m, b) => math.max(m, b._2)).tail
          val total = cums.last
          if (total <= 0) Double.NaN
          else {
            val rank = q * total
            val b = cums.indexWhere(_ >= rank)
            if (b == bs.length - 1) bs(bs.length - 2)._1
            else if (b == 0 && bs.head._1 <= 0) bs.head._1
            else {
              val lo = if (b == 0) 0.0 else bs(b - 1)._1
              val loCum = if (b == 0) 0.0 else cums(b - 1)
              val cnt = cums(b) - loCum
              lo + (bs(b)._1 - lo) *
                (if (cnt == 0) Double.NaN else (rank - loCum) / cnt)
            }
          }
        }
      }
    }
    val rnd = new Random(31)
    // 30 random histograms: varying bucket counts, ~15% missing +Inf, ~30%
    // non-monotone cumulative counts (scrape races), ~10% all-zero
    val hists: Seq[(String, Seq[(Double, Double)])] = (0 until 30).map { i =>
      val n = 2 + rnd.nextInt(6)
      val bounds = Seq.tabulate(n)(j => (j + 1) * (0.1 + rnd.nextDouble())).sorted
      val withInf = if (rnd.nextInt(100) < 85) bounds :+ Double.PositiveInfinity else bounds
      val counts =
        if (rnd.nextInt(10) == 0) Seq.fill(withInf.length)(0.0)
        else {
          val mono = withInf.indices.map(_ => rnd.nextInt(20).toDouble)
            .scanLeft(0.0)(_ + _).tail
          if (rnd.nextInt(10) < 3) {
            val k = rnd.nextInt(mono.length)
            mono.updated(k, math.max(0.0, mono(k) - rnd.nextInt(15)))
          } else mono
        }
      s"g$i" -> withInf.zip(counts)
    }
    val t = 1000L
    val df = hists.flatMap { case (g, bs) => bs.map { case (le, c) =>
        val leStr = if (le.isPosInfinity) "+Inf" else le.toString
        ("hf", g, leStr, t, c, (g + leStr).hashCode.toLong)
      } }
      .toDF("__name__", "g", "le", "ts_ms", "value", "sample_id")
      .withColumn("series_hash", xxhash64(col("__name__"), col("g"), col("le")))
    val failures = for {
      phi <- Seq(0.0, 0.25, 0.5, 0.9, 0.99, 1.0, -0.5, 1.5)
      engine = Compiler.compile(
          Parser.parse(s"histogram_quantile($phi, hf)"),
          Compiler.Ctx(df, t, t, 1000L, 300000L))
        .collect().map(r => r.getAs[String]("g") -> r.getAs[Double]("value")).toMap
      naive = hists.map { case (g, bs) => g -> bucketQuantile(phi, bs) }.toMap
      if !(engine.keySet == naive.keySet && naive.forall { case (g, v) =>
        (v.isNaN && engine(g).isNaN) || math.abs(engine(g) - v) < 1e-9 || engine(g) == v })
    } yield s"phi=$phi\n  engine=${engine.toSeq.sortBy(_._1)}\n  naive =${naive.toSeq.sortBy(_._1)}"
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("random binop queries agree with naive division") {
    val rnd = new Random(7)
    val names = Seq("click", "view", "purchase", "signup", "error")
    val failures = (1 to 20).flatMap { i =>
      val (a, b) = (names(rnd.nextInt(5)), names(rnd.nextInt(5)))
      val t = T0 + (5 + rnd.nextInt(20)) * DAY
      val q = s"""{__name__="$a"} / on(uid) {__name__="$b"}"""
      val engine = Compiler.compile(Parser.parse(q),
          Compiler.Ctx(samples, t, t, 1000L, DAY))
        .collect().map(r => r.getAs[String]("uid") -> r.getAs[Double]("value")).toMap
      val va = naiveInstant(Some(a), None, None, t, DAY).map { case ((_, u), v) => u -> v }
      val vb = naiveInstant(Some(b), None, None, t, DAY).map { case ((_, u), v) => u -> v }
      val naive = va.flatMap { case (u, x) => vb.get(u).map(y => u -> x / y) }
      val ok = engine.keySet == naive.keySet &&
        naive.forall { case (k, v) => math.abs(engine(k) - v) <= 1e-12 * math.max(1.0, math.abs(v)) }
      if (ok) None else Some(s"#$i $q\n  engine=$engine\n  naive =$naive")
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("30 seeded random queries give identical results over raw samples and the chunk layout") {
    // storage-layout differential: the decoded Gorilla layout must be
    // indistinguishable from flat samples to the whole engine (this is the
    // class of gap that bit the rate path's sample_id tie-break)
    val out = java.nio.file.Files.createTempDirectory("graft-fuzz-chunk").toString
    graft.etl.Ingest.convertChunked(spark, Tables(spark, sf()).events, out)
    val chunked = graft.etl.Ingest.openChunkedSamples(spark, out)

    val rnd = new Random(99)
    val names = Seq("click", "view", "purchase", "signup", "error")
    def gen(): String = {
      val n = names(rnd.nextInt(5)); val m = names(rnd.nextInt(5))
      val w = 1 + rnd.nextInt(48)
      rnd.nextInt(8) match {
        case 0 => s"""sum by (__name__) ({__name__=~"$n|$m"})"""
        case 1 => s"rate($n[${w}h])"
        case 2 => s"max_over_time($n[${w}h])"
        case 3 => s"topk(3, $n)"
        case 4 => s"""{__name__="$n"} / on(uid) {__name__="$m"}"""
        case 5 => s"quantile(0.${1 + rnd.nextInt(9)}, $n)"
        case 6 => s"increase($n[${w}h]) > 0"
        case 7 => s"""count({uid=~"1.*"}) by (__name__)"""
      }
    }
    val failures = (1 to 30).flatMap { i =>
      val q = gen()
      val t = T0 + (5 + rnd.nextInt(20)) * DAY
      val (s0, e0, st) =
        if (i % 3 == 0) (t - 2 * DAY, t, 6L * 3600 * 1000) else (t, t, 1000L)
      val a = Compiler.compile(Parser.parse(q), Compiler.Ctx(samples, s0, e0, st, DAY))
      val b = Compiler.compile(Parser.parse(q), Compiler.Ctx(chunked, s0, e0, st, DAY))
      if (a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty) None
      else Some(s"#$i $q @$s0..$e0/$st")
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
