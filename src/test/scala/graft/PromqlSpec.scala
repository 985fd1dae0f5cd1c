package graft

import org.apache.spark.sql.functions._
import graft.model.TimeSeriesModel
import graft.promql._
import graft.promql.Ast._
import graft.sources.Tables

/** Parser + compiler semantics, differentially tested against hand-built
  * DataFrame plans on the events fixture (the analog of the reference's
  * Prometheus-vs-parquet differential corpus, db/db_test.go:313-1127). */
class PromqlSpec extends SparkSpec {
  import spark.implicits._

  private val DAY = 86400000L
  private val T0 = 1704067200000L
  private val TI = T0 + 14 * DAY

  private lazy val samples = TimeSeriesModel.samples(Tables(spark, sf()).events)
  private def ctxAt(t: Long) = Compiler.Ctx(samples, t, t, 1000L, DAY)
  private def eval(q: String, t: Long = TI) =
    Compiler.compile(Parser.parse(q), ctxAt(t))

  test("parser: selectors, matchers, ranges, aggregations, binops") {
    assert(Parser.parse("up") == Selector(Some("up"), Nil, None))
    assert(Parser.parse("""up{job="x", code=~"4.."}""") ==
      Selector(Some("up"), Seq(MatchEq("job", "x"), MatchRe("code", "4..")), None))
    assert(Parser.parse("rate(http[5m])") ==
      Call("rate", Seq(Selector(Some("http"), Nil, Some(300000L)))))
    assert(Parser.parse("sum by (a, b) (up)") ==
      Agg("sum", By(Seq("a", "b")), None, Selector(Some("up"), Nil, None)))
    assert(Parser.parse("sum(up) without (a)") ==
      Agg("sum", Without(Seq("a")), None, Selector(Some("up"), Nil, None)))
    assert(Parser.parse("topk(3, up)") ==
      Agg("topk", NoGrouping, Some(NumberLit(3)), Selector(Some("up"), Nil, None)))
    assert(Parser.parse("a / on(uid) b") == BinOp("/",
      Selector(Some("a"), Nil, None), Selector(Some("b"), Nil, None),
      Some(Matching(on = true, Seq("uid"), groupLeft = false, groupRight = false)), bool = false))
    assert(Parser.parse("a and b or c") == BinOp("or",
      BinOp("and", Selector(Some("a"), Nil, None), Selector(Some("b"), Nil, None), None, false),
      Selector(Some("c"), Nil, None), None, false))
    // precedence: * binds tighter than +
    assert(Parser.parse("1 + 2 * 3") ==
      BinOp("+", NumberLit(1), BinOp("*", NumberLit(2), NumberLit(3), None, false), None, false))
    assert(Parser.parseDuration("1h30m") == 5400000L)
    assertThrows[ParseException](Parser.parse("sum(("))
    assertThrows[ParseException](Parser.parse("up[bad]"))
  }

  test("parser: unary +/- and malformed numbers") {
    assert(Parser.parse("-2") == NumberLit(-2.0))
    assert(Parser.parse("+2") == NumberLit(2.0))
    // unary minus on a vector desugars to -1 * expr (name-dropping negation)
    assert(Parser.parse("-up") ==
      BinOp("*", NumberLit(-1.0), Selector(Some("up"), Nil, None), None, bool = false))
    assert(Parser.parse("+up") == Selector(Some("up"), Nil, None))
    // malformed numbers raise ParseException, not raw NumberFormatException
    assertThrows[ParseException](Parser.parse("1.2.3"))
    assertThrows[ParseException](Parser.parse("1e"))
    // only nan/inf are number keywords (Prometheus lexer): a metric
    // legitimately named `infinity` stays a selector
    assert(Parser.parse("Inf") == NumberLit(Double.PositiveInfinity))
    assert(Parser.parse("iNf") == NumberLit(Double.PositiveInfinity))
    assert(Parser.parse("infinity") == Selector(Some("infinity"), Nil, None))
    // unary minus binds looser than ^-chains but tighter than */
    val neg = eval("""-{__name__="purchase"}""").select($"uid", $"value")
    val pos = eval("""{__name__="purchase"}""").select($"uid", ($"value" * -1).as("value"))
    assert(neg.exceptAll(pos).isEmpty && pos.exceptAll(neg).isEmpty && neg.count() > 0)
    // -2^2 = -(2^2) = -4, NOT (-2)^2 = 4: unary minus desugars OUTSIDE the
    // power chain (Prometheus precedence; regression for the parser fix)
    assert(Parser.parse("-2^2") ==
      BinOp("*", NumberLit(-1.0),
        BinOp("^", NumberLit(2), NumberLit(2), None, bool = false), None, bool = false))
    assert(eval("-2^2").select($"value").as[Double].head() == -4.0)
    // …while an explicit parenthesized base keeps (-2)^2 = 4
    assert(eval("(-2)^2").select($"value").as[Double].head() == 4.0)
    // % follows Go math.Mod: sign of the dividend (pmod would give +1)
    assert(eval("(0 - 5) % 3").select($"value").as[Double].head() == -2.0)
  }

  test("set ops match full label sets (union of columns, absent==absent)") {
    // differing label sets: {uid} vs {} — no element of rhs can match lhs
    val lhsN = eval("""sum by (uid) ({__name__="purchase"})""").count()
    val rhsN = eval("""sum by (__name__) ({__name__="view"})""").count()
    assert(lhsN > 0 && rhsN > 0)
    // `and` finds no label-set-equal pairs → empty (old intersection-matching
    // bug: shared=[] joined on step only, keeping the whole lhs)
    assert(eval(
      """sum by (uid) ({__name__="purchase"}) and sum by (__name__) ({__name__="view"})""")
      .count() == 0)
    // `or` keeps both sides entirely
    assert(eval(
      """sum by (uid) ({__name__="purchase"}) or sum by (__name__) ({__name__="view"})""")
      .count() == lhsN + rhsN)
    // `unless` removes nothing
    assert(eval(
      """sum by (uid) ({__name__="purchase"}) unless sum by (__name__) ({__name__="view"})""")
      .count() == lhsN)
    // identical label sets still dedup on `or` (matching ignores __name__)
    assert(eval("""{__name__="purchase"} or {__name__="purchase"}""").count() == lhsN)
  }

  test("instant selector matches hand-built lookback eval") {
    val got = eval("""{__name__="purchase"}""")
      .select($"uid", $"value")
    val want = Eval.instantVector(samples, Seq(MatchEq("__name__", "purchase")), TI, DAY)
      .select($"uid", $"value")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    assert(got.count() > 0)
  }

  test("sum by / without match manual groupBy") {
    val got = eval("""sum by (__name__) ({uid!=""})""")
      .select($"__name__", $"value")
    val want = Eval.instantVector(samples, Nil, TI, DAY)
      .groupBy($"__name__").agg(graft.functions.Det.dsum($"value").as("value"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)

    // PromQL `without` also drops __name__ → all metrics merge into one series
    val gotW = eval("""sum without (uid) ({uid!=""})""")
    val total = Eval.instantVector(samples, Nil, TI, DAY)
      .agg(graft.functions.Det.dsum($"value")).head().getDouble(0)
    assert(gotW.count() == 1 && gotW.select($"value").head().getDouble(0) == total)

    // ungrouped sum: one row
    assert(eval("""sum({uid!=""})""").count() == 1)
  }

  test("rate/increase apply Prometheus extrapolation (hand-computed example)") {
    // window (0, 10000]: samples 2000→0, 4000→10, 8000→20
    // si=6s ai=3s thr=3.3s; ds0=2s but zero-crossing clamp (fv=0) → ds=0;
    // de0=2s<thr → 2; factor=(6+0+2)/6; increase=20·8/6; rate=increase/10
    val df = Seq(("c", "1", 2000L, 0.0, 1L), ("c", "1", 4000L, 10.0, 2L),
        ("c", "1", 8000L, 20.0, 3L))
      .toDF("__name__", "uid", "ts_ms", "value", "sample_id")
      .withColumn("series_hash", xxhash64($"__name__", $"uid"))
    val ctx = Compiler.Ctx(df, 10000L, 10000L, 1000L, DAY)
    val rate = Compiler.compile(Parser.parse("rate(c[10s])"), ctx)
      .select($"value").as[Double].head()
    assert(math.abs(rate - 20.0 * (8.0 / 6.0) / 10.0) < 1e-12)
    val inc = Compiler.compile(Parser.parse("increase(c[10s])"), ctx)
      .select($"value").as[Double].head()
    assert(math.abs(inc - 20.0 * (8.0 / 6.0)) < 1e-12)
    // reset correction still applies: drop to 5 then 15 → rv includes +20
    val df2 = Seq(("c", "1", 2000L, 10.0, 1L), ("c", "1", 4000L, 20.0, 2L),
        ("c", "1", 6000L, 5.0, 3L), ("c", "1", 8000L, 15.0, 4L))
      .toDF("__name__", "uid", "ts_ms", "value", "sample_id")
      .withColumn("series_hash", xxhash64($"__name__", $"uid"))
    val inc2 = Compiler.compile(Parser.parse("increase(c[10s])"),
        Compiler.Ctx(df2, 10000L, 10000L, 1000L, DAY))
      .select($"value").as[Double].head()
    // rv = 15-10+20 = 25; si=6 ai=2 thr=2.2; ds0=2<2.2 keep (dz=10/25·6=2.4>2);
    // de0=2<2.2 keep; factor=(6+2+2)/6
    assert(math.abs(inc2 - 25.0 * (10.0 / 6.0)) < 1e-12)
  }

  test("offset shifts evaluation time; subquery feeds range functions") {
    val off = eval("""{__name__="purchase"} offset 1d""").select($"uid", $"value")
    val want = Eval.instantVector(samples, Seq(MatchEq("__name__", "purchase")), TI - DAY, DAY)
      .select($"uid", $"value")
    assert(off.exceptAll(want).isEmpty && want.exceptAll(off).isEmpty)
    assert(off.count() > 0)

    // sum_over_time(sum(m)[1d:6h]): inner total at 6h grid points, summed
    val sq = eval("""sum_over_time(sum({uid!=""})[1d:6h])""")
      .select($"value").as[Double].head()
    val innerCtx = Compiler.Ctx(samples, TI - DAY, TI, 21600000L, DAY)
    val innerSum = Compiler.compile(Parser.parse("""sum({uid!=""})"""), innerCtx)
      .filter($"step_ms" > TI - DAY) // window is (t-range, t]
      .agg(graft.functions.Det.dsum($"value")).head().getDouble(0)
    assert(math.abs(sq - innerSum) < 1e-9)
  }

  test("vector binop with on(uid) matches manual join; scalar ops; comparisons") {
    val got = eval("""{__name__="purchase"} / on(uid) {__name__="view"}""")
      .select($"uid", $"value")
    val p = Eval.instantVector(samples, Seq(MatchEq("__name__", "purchase")), TI, DAY)
      .select($"uid", $"value")
    val v = Eval.instantVector(samples, Seq(MatchEq("__name__", "view")), TI, DAY)
      .select($"uid", $"value".as("rv"))
    val want = p.join(v, "uid").select($"uid", ($"value" / $"rv").as("value"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)

    // vector * scalar
    val x2 = eval("""{__name__="purchase"} * 2""").select($"uid", $"value")
    val wantX2 = p.select($"uid", ($"value" * 2).as("value"))
    assert(x2.exceptAll(wantX2).isEmpty && wantX2.exceptAll(x2).isEmpty)

    // comparison filters; bool yields 0/1
    val gt = eval("""{__name__="purchase"} > 100""")
    assert(gt.count() == p.filter($"value" > 100).count())
    val gtBool = eval("""{__name__="purchase"} > bool 100""")
    assert(gtBool.agg(sum($"value")).head().getDouble(0) == gt.count().toDouble)

    // group_left keeps the many-side's extra labels (minus __name__, which
    // arithmetic always drops); group_right is the mirror
    val glDf = eval("""label_replace({__name__="purchase"}, "tier", "gold", "uid", "(.*)")""" +
      """ / on(uid) group_left {__name__="view"}""")
    assert(glDf.columns.toSet == Set("step_ms", "uid", "tier", "value"))
    assert(glDf.select($"tier").distinct().as[String].collect().toSeq == Seq("gold"))
    val grDf = eval("""{__name__="purchase"} / on(uid) group_right """ +
      """label_replace({__name__="view"}, "src", "web", "uid", "(.*)")""")
    assert(grDf.columns.toSet == Set("step_ms", "uid", "src", "value"))
    // values identical to plain on(uid) matching
    assert(glDf.select($"uid", $"value").exceptAll(got).isEmpty)
    assert(grDf.select($"uid", $"value").exceptAll(got).isEmpty)

    // and / unless partition the lhs
    val andC = eval("""{__name__="purchase"} and {__name__="error"}""").count()
    val unlessC = eval("""{__name__="purchase"} unless {__name__="error"}""").count()
    assert(andC + unlessC == p.count())
  }

  test("topk / quantile / label functions") {
    val t3 = eval("""topk(3, {__name__=~".+"})""")
    assert(t3.count() == 3)
    val q = eval("""quantile(0.5, {__name__="purchase"})""")
    assert(q.count() == 1)
    val lr = eval("""label_replace({__name__="purchase"}, "tier", "t-$1", "uid", "(.*)")""")
    assert(lr.columns.contains("tier"))
    assert(lr.filter($"tier" === concat(lit("t-"), $"uid")).count() == lr.count())
    val lj = eval("""label_join({__name__="purchase"}, "joined", "/", "__name__", "uid")""")
    assert(lj.filter($"joined" === concat_ws("/", $"__name__", $"uid")).count() == lj.count())
  }

  test("quantile_over_time, absent, count_values, group") {
    // quantile_over_time(0.5, …) over 1,5,9 in one window → 5
    val df = Seq(("m", "1", 2000L, 1.0, 1L), ("m", "1", 4000L, 9.0, 2L),
        ("m", "1", 6000L, 5.0, 3L))
      .toDF("__name__", "uid", "ts_ms", "value", "sample_id")
      .withColumn("series_hash", xxhash64($"__name__", $"uid"))
    val ctx10 = Compiler.Ctx(df, 10000L, 10000L, 1000L, DAY)
    val med = Compiler.compile(Parser.parse("quantile_over_time(0.5, m[10s])"), ctx10)
      .select($"value").as[Double].head()
    assert(med == 5.0)
    val q25 = Compiler.compile(Parser.parse("quantile_over_time(0.25, m[10s])"), ctx10)
      .select($"value").as[Double].head()
    assert(q25 == 3.0) // 1 + 0.5·(5−1)

    // absent copies equality-matcher labels (never __name__; a label with a
    // second matcher of any kind is dropped — createLabelsForAbsentFunction)
    val ab = Compiler.compile(Parser.parse(
      """absent({__name__="nope", job="api", env=~"pr.*", dc="x", dc!="y"})"""), ctx10)
    assert(ab.columns.toSet == Set("step_ms", "value", "job"))
    assert(ab.select($"job").distinct().as[String].collect().toSeq == Seq("api"))
    // absent: nothing matches → 1; something matches → empty
    assert(Compiler.compile(Parser.parse("""absent({__name__="nope"})"""), ctx10)
      .select($"value").as[Double].collect().toSeq == Seq(1.0))
    assert(eval("""absent({__name__="purchase"})""").count() == 0)

    // count_values over the instant vector: Σ counts = Σ series
    val cv = eval("""count_values("v", {uid!=""})""")
    assert(cv.columns.contains("v"))
    val nSeries = Eval.instantVector(samples, Nil, TI, DAY).count()
    assert(cv.agg(sum($"value")).head().getDouble(0) == nSeries.toDouble)

    // group: one row per group, value 1
    val g = eval("""group by (__name__) ({uid!=""})""")
    assert(g.count() == 5 && g.select($"value").distinct().as[Double].head() == 1.0)
  }

  test("calendar functions over the eval timestamp") {
    // TI = 2024-01-15T00:00:00Z, a Monday
    def one(q: String) = eval(q).select($"value").as[Double].head()
    assert(one("hour()") == 0.0)
    assert(one("minute()") == 0.0)
    assert(one("day_of_week()") == 1.0) // 0=Sunday
    assert(one("day_of_month()") == 15.0)
    assert(one("month()") == 1.0)
    assert(one("year()") == 2024.0)
    assert(one("days_in_month()") == 31.0)
    // over an explicit vector: timestamps shifted half a day
    assert(one("hour(vector(1705276800 + 43200))") == 12.0)
  }

  test("changes, resets, deriv, predict_linear") {
    // window (0, 10000]: 2s→0, 4s→10, 6s→10, 8s→5
    val df = Seq(("m", "1", 2000L, 0.0, 1L), ("m", "1", 4000L, 10.0, 2L),
        ("m", "1", 6000L, 10.0, 3L), ("m", "1", 8000L, 5.0, 4L))
      .toDF("__name__", "uid", "ts_ms", "value", "sample_id")
      .withColumn("series_hash", xxhash64($"__name__", $"uid"))
    val ctx = Compiler.Ctx(df, 10000L, 10000L, 1000L, DAY)
    def one(q: String) = Compiler.compile(Parser.parse(q), ctx)
      .select($"value").as[Double].head()
    assert(one("changes(m[10s])") == 2.0) // 0→10, 10→5
    assert(one("resets(m[10s])") == 1.0)  // 10→5
    // least squares over t=(2,4,6,8)s v=(0,10,10,5): slope = 0.75, mean_v=6.25
    assert(math.abs(one("deriv(m[10s])") - 0.75) < 1e-9)
    // predict at window_end+10s = 20s rel: 6.25 + 0.75*(20-5) = 17.5
    assert(math.abs(one("predict_linear(m[10s], 10)") - 17.5) < 1e-9)
  }

  test("holt_winters double exponential smoothing") {
    // v=[10,12,14] sf=0.5 tf=0.3: linear data smooths exactly to the last
    // value (s1 carries the trend): expect 14; v=[10,12,11] → 12.5
    def series(vs: Seq[Double]) = vs.zipWithIndex
      .map { case (v, i) => ("m", "1", 2000L * (i + 1), v, (i + 1).toLong) }
      .toDF("__name__", "uid", "ts_ms", "value", "sample_id")
      .withColumn("series_hash", xxhash64($"__name__", $"uid"))
    def hw(vs: Seq[Double]) = Compiler.compile(
        Parser.parse("holt_winters(m[10s], 0.5, 0.3)"),
        Compiler.Ctx(series(vs), 10000L, 10000L, 1000L, DAY))
      .select($"value").as[Double].head()
    assert(hw(Seq(10.0, 12.0, 14.0)) == 14.0)
    assert(hw(Seq(10.0, 12.0, 11.0)) == 12.5)
  }

  test("trig/deg/rad/pi scalar functions and atan2 binop") {
    def one(q: String) = eval(q).select($"value").as[Double].head()
    assert(one("pi()") == math.Pi)
    assert(math.abs(one("sin(vector(1))") - math.sin(1.0)) < 1e-15)
    assert(math.abs(one("cos(vector(1))") - math.cos(1.0)) < 1e-15)
    assert(math.abs(one("atan(vector(1))") - math.atan(1.0)) < 1e-15)
    assert(math.abs(one("asinh(vector(2))") - 1.4436354751788103) < 1e-15)
    assert(one("deg(vector(3.141592653589793))") == 180.0)
    assert(one("rad(vector(180))") == math.Pi)
    assert(math.abs(one("vector(1) atan2 vector(2)") - math.atan2(1.0, 2.0)) < 1e-15)
    // precedence: atan2 binds like * (tighter than +)
    assert(Parser.parse("1 + 2 atan2 3") ==
      BinOp("+", NumberLit(1), BinOp("atan2", NumberLit(2), NumberLit(3), None, false), None, false))
  }

  test("round with to_nearest; day_of_year") {
    def one(q: String) = eval(q).select($"value").as[Double].head()
    assert(one("round(vector(2.4))") == 2.0)
    assert(one("round(vector(2.5))") == 3.0)   // ties toward +Inf
    assert(one("round(vector(-2.5))") == -2.0) // not HALF_UP
    assert(one("round(vector(7), 5)") == 5.0)
    assert(one("round(vector(8), 5)") == 10.0)
    assert(one("day_of_year()") == 15.0) // TI = 2024-01-15
  }

  test("irate, stdvar/mad/present/absent_over_time") {
    // window (0, 10000]: 2s→0, 4s→10, 6s→10, 8s→5
    val df = Seq(("m", "1", 2000L, 0.0, 1L), ("m", "1", 4000L, 10.0, 2L),
        ("m", "1", 6000L, 10.0, 3L), ("m", "1", 8000L, 5.0, 4L))
      .toDF("__name__", "uid", "ts_ms", "value", "sample_id")
      .withColumn("series_hash", xxhash64($"__name__", $"uid"))
    val ctx = Compiler.Ctx(df, 10000L, 10000L, 1000L, DAY)
    def one(q: String) = Compiler.compile(Parser.parse(q), ctx)
      .select($"value").as[Double].head()
    // last pair 10→5 is a counter reset: irate = 5 / 2s = 2.5
    assert(one("irate(m[10s])") == 2.5)
    // mean 6.25; var = ((0-6.25)²+(10-6.25)²·2+(5-6.25)²)/4 = 17.1875
    assert(math.abs(one("stdvar_over_time(m[10s])") - 17.1875) < 1e-9)
    assert(math.abs(one("stddev_over_time(m[10s])") - math.sqrt(17.1875)) < 1e-9)
    // sorted [0,5,10,10]: median 7.5; |x-7.5| sorted [2.5,2.5,2.5,7.5] → mad 2.5
    assert(one("mad_over_time(m[10s])") == 2.5)
    assert(one("present_over_time(m[10s])") == 1.0)
    // absent_over_time: nothing matched → 1; matched → empty
    assert(Compiler.compile(Parser.parse("absent_over_time(nope[10s])"), ctx)
      .select($"value").as[Double].collect().toSeq == Seq(1.0))
    assert(Compiler.compile(Parser.parse("absent_over_time(m[10s])"), ctx).count() == 0)
  }

  test("@ modifier: parse, fixed-instant broadcast, start()/end()") {
    assert(Parser.parse("up @ 300") ==
      Selector(Some("up"), Nil, None, 0L, Some(AtTime(300000L))))
    assert(Parser.parse("up[5m] @ start() offset 5m") ==
      Selector(Some("up"), Nil, Some(300000L), 300000L, Some(AtStart)))
    assert(Parser.parse("up offset -5m") ==
      Selector(Some("up"), Nil, None, -300000L))
    // range query [TI, TI+4s] step 2s: `@ TI` pins every step to TI's answer
    val rctx = Compiler.Ctx(samples, TI, TI + 4000L, 2000L, DAY)
    val pinned = Compiler.compile(
      Parser.parse(s"""{__name__="purchase"} @ ${TI / 1000}"""), rctx)
      .select($"step_ms", $"uid", $"value").collect()
    assert(pinned.map(_.getLong(0)).distinct.sorted.toSeq ==
      Seq(TI, TI + 2000L, TI + 4000L))
    val atTI = eval("""{__name__="purchase"}""")
      .select($"uid", $"value").collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    for (s <- Seq(TI, TI + 2000L, TI + 4000L))
      assert(pinned.filter(_.getLong(0) == s)
        .map(r => (r.getString(1), r.getDouble(2))).toSet == atTI)
    // @ end() over the range ctx ≡ instant answer at endMs, on every step
    val pinnedEnd = Compiler.compile(
      Parser.parse("""sum(rate({__name__="purchase"}[1d] @ end()))"""), rctx)
      .select($"step_ms", $"value").collect()
    val rateEnd = Compiler.compile(
      Parser.parse("""sum(rate({__name__="purchase"}[1d]))"""),
      ctxAt(TI + 4000L)).select($"value").as[Double].head()
    assert(pinnedEnd.length == 3 && pinnedEnd.forall(_.getDouble(1) == rateEnd))
    // @ start() on an instant selector
    val pinnedStart = Compiler.compile(
      Parser.parse("""{__name__="purchase"} @ start()"""), rctx)
      .select($"step_ms", $"uid", $"value").collect()
    assert(pinnedStart.filter(_.getLong(0) == TI + 4000L)
      .map(r => (r.getString(1), r.getDouble(2))).toSet == atTI)
  }

  test("group_left/group_right carry labels from the one side") {
    val t = 5000L
    val df = Seq(
        ("m", "1", None: Option[String], t, 10.0, 1L),
        ("m", "2", None: Option[String], t, 20.0, 2L),
        ("info", "1", Some("gold"), t, 1.0, 3L),
        ("info", "2", Some("silver"), t, 1.0, 4L))
      .toDF("__name__", "uid", "tier", "ts_ms", "value", "sample_id")
      .withColumn("series_hash", xxhash64($"__name__", $"uid", $"tier"))
    val ctx = Compiler.Ctx(df, 10000L, 10000L, 1000L, DAY)
    def run(q: String) = Compiler.compile(Parser.parse(q), ctx)
    val gl = run("""{__name__="m"} * on(uid) group_left(tier) {__name__="info"}""")
      .select($"uid", $"tier", $"value").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(gl == Set(("1", "gold", 10.0), ("2", "silver", 20.0)))
    val gr = run("""{__name__="info"} * on(uid) group_right(tier) {__name__="m"}""")
      .select($"uid", $"tier", $"value").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(gr == Set(("1", "gold", 10.0), ("2", "silver", 20.0)))
    // parser keeps the include list
    assert(Parser.parse("a * on(x) group_left(t1, t2) b") ==
      BinOp("*", Selector(Some("a"), Nil, None), Selector(Some("b"), Nil, None),
        Some(Matching(on = true, Seq("x"), groupLeft = true, groupRight = false,
          include = Seq("t1", "t2"))), bool = false))
  }

  test("group_left errors on a many-to-many match (duplicate one side)") {
    val t = 5000L
    // two `info` series share uid=1 → rhs not unique per on(uid) group
    val df = Seq(
        ("m", "1", Some("a"), t, 10.0, 1L),
        ("info", "1", Some("gold"), t, 1.0, 3L),
        ("info", "1", Some("silver"), t, 2.0, 4L))
      .toDF("__name__", "uid", "tier", "ts_ms", "value", "sample_id")
      .withColumn("series_hash", xxhash64($"__name__", $"uid", $"tier"))
    val ctx = Compiler.Ctx(df, 10000L, 10000L, 1000L, DAY)
    val bad = Compiler.compile(Parser.parse(
      """{__name__="m"} * on(uid) group_left {__name__="info"}"""), ctx)
    val e = intercept[Exception](bad.collect())
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("many-to-many")))
    // …while a genuine 1:N match (distinct uids) still answers
    val ok = Compiler.compile(Parser.parse(
      """{__name__="m"} * on(uid) group_left(tier) {__name__="info", tier="gold"}"""), ctx)
      .select($"uid", $"tier", $"value").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(ok == Set(("1", "gold", 10.0)))
  }

  test("stashed-name duplicates cannot silently multiply through a binop") {
    // abs() stashes __name__; m1/m2 then share the full VISIBLE labelset, so
    // the static covered-skip must not compile their duplicate guard away
    // (upstream rejects such vectors — silent row multiplication is the
    // regression this pins).
    val t = 5000L
    val df = Seq(
        ("m1", "j", t, 1.0, 1L),
        ("m2", "j", t, 2.0, 2L),
        ("rhs", "j", t, 10.0, 3L))
      .toDF("__name__", "job", "ts_ms", "value", "sample_id")
      .withColumn("series_hash", xxhash64($"__name__", $"job"))
    val ctx = Compiler.Ctx(df, 10000L, 10000L, 1000L, DAY)
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    val lhsDup = Compiler.compile(Parser.parse(
      """abs({__name__=~"m1|m2"}) + {__name__="rhs"}"""), ctx)
    val e1 = intercept[Exception](lhsDup.collect())
    assert(msgs(e1).exists(m => m != null && m.contains("duplicate series")))
    val rhsDup = Compiler.compile(Parser.parse(
      """{__name__="rhs"} + abs({__name__=~"m1|m2"})"""), ctx)
    val e2 = intercept[Exception](rhsDup.collect())
    assert(msgs(e2).exists(m => m != null && m.contains("duplicate series")))
    // exact-name stashes stay statically safe: the hot binop shape compiles
    // with NO duplicate guard in the plan, and still executes
    val hot = Compiler.compile(Parser.parse(
      """rate({__name__="m1"}[1m]) / rate({__name__="m2"}[1m])"""), ctx)
    val plan = hot.queryExecution.optimizedPlan.toString
    assert(!plan.contains("__graft_c") && !plan.contains("__graft_rc"))
    hot.collect()
    // passthrough aggregations (topk/bottomk/limitk/limit_ratio) keep the
    // child's stash rows intact, so the skip must use the CHILD's stash
    // bound — upstream raises duplicate-series here too (ADVICE r20 #2)
    val topkDup = Compiler.compile(Parser.parse(
      """topk(3, abs({__name__=~"m1|m2"})) + {__name__="rhs"}"""), ctx)
    val e3 = intercept[Exception](topkDup.collect())
    assert(msgs(e3).exists(m => m != null && m.contains("duplicate series")))
    // stash-dropping aggregations stay statically safe (sum re-keys rows)
    Compiler.compile(Parser.parse(
      """sum by (job) (abs({__name__=~"m1|m2"})) + {__name__="rhs"}"""), ctx)
      .collect()
  }

  test("topk/quantile accept data-dependent scalar(...) parameters per step") {
    val df = Seq(
        ("m", "a", 1000L, 10.0, 1L), ("m", "b", 1000L, 20.0, 2L),
        ("m", "c", 1000L, 30.0, 3L),
        ("m", "a", 2000L, 11.0, 4L), ("m", "b", 2000L, 21.0, 5L),
        ("m", "c", 2000L, 31.0, 6L),
        ("km", "k", 1000L, 1.0, 7L), ("km", "k", 2000L, 2.0, 8L),
        ("qm", "q", 1000L, 0.5, 9L), ("qm", "q", 2000L, 1.5, 10L))
      .toDF("__name__", "uid", "ts_ms", "value", "sample_id")
      .withColumn("series_hash", xxhash64($"__name__", $"uid"))
    val ctx = Compiler.Ctx(df, 1000L, 2000L, 1000L, DAY)
    // k = scalar(km) is 1 at the first step, 2 at the second — evaluated
    // per step like upstream (this was a loud-unsupported ParseException)
    val tk = Compiler.compile(Parser.parse(
        """topk(scalar({__name__="km"}), {__name__="m"})"""), ctx)
      .select($"step_ms", $"uid").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(tk == Set((1000L, "c"), (2000L, "b"), (2000L, "c")))
    // φ = scalar(qm): valid at step 1 (median), out-of-range at step 2 (+Inf)
    val q = Compiler.compile(Parser.parse(
        """quantile(scalar({__name__="qm"}), {__name__="m"})"""), ctx)
      .select($"step_ms", $"value").collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(q(1000L) == 20.0 && q(2000L).isPosInfinity)
    // a vector-typed parameter stays a type error
    val e = intercept[ParseException](Compiler.compile(Parser.parse(
      """topk({__name__="km"}, {__name__="m"})"""), ctx))
    assert(e.getMessage.contains("expected type scalar"))
  }

  test("lhs duplicate sentinel survives key-only and filter-form consumers") {
    val t = 5000L
    val df = Seq(
        ("l", "j", Some("1"), t, 1.0, 1L),
        ("l", "j", Some("2"), t, 2.0, 2L),
        ("r", "j", None: Option[String], t, 5.0, 3L),
        ("x", "j", None: Option[String], t, 7.0, 4L))
      .toDF("__name__", "job", "extra", "ts_ms", "value", "sample_id")
      .withColumn("series_hash", xxhash64($"__name__", $"job", $"extra"))
    val ctx = Compiler.Ctx(df, 10000L, 10000L, 1000L, DAY)
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    // `and` reads only step_ms+keys off its rhs before distinct() — a
    // value-column raise would be pruned away and the phantom row leaked
    val e1 = intercept[Exception](Compiler.compile(Parser.parse(
      """{__name__="x"} and on(job) ({__name__="l"} + on(job) {__name__="r"})"""),
      ctx).collect())
    assert(msgs(e1).exists(m => m != null && m.contains("left hand-side")))
    // filter-form comparison: the predicate reads value — a step_ms-only
    // raise would be lost to constant folding of the literal-0.0 predicate
    val e2 = intercept[Exception](Compiler.compile(Parser.parse(
      """{__name__="l"} > on(job) {__name__="r"}"""), ctx).collect())
    assert(msgs(e2).exists(m => m != null && m.contains("left hand-side")))
  }

  test("limitk / limit_ratio: deterministic hash-based series sampling") {
    val all = eval("""{uid!=""}""").count()
    assert(eval("""limitk(3, {uid!=""})""").count() == math.min(3L, all))
    // partition property: r and -(1-r) split the series set exactly
    val keep = eval("""limit_ratio(0.4, {uid!=""})""").count()
    val drop = eval("""limit_ratio(-0.6, {uid!=""})""").count()
    assert(keep + drop == all)
    // deterministic: same query twice → same series
    val a = eval("""limit_ratio(0.4, {uid!=""})""")
      .select($"__name__", $"uid").collect().toSet
    val b = eval("""limit_ratio(0.4, {uid!=""})""")
      .select($"__name__", $"uid").collect().toSet
    assert(a == b)
    // grouped limitk: at most k per group
    val perG = eval("""limitk(2, {uid!=""}) by (__name__)""")
      .groupBy($"__name__").count().select($"count").as[Long].collect()
    assert(perG.forall(_ <= 2))
  }

  test("info(): experimental target_info enrichment joins on identity labels") {
    val t = 1000000L
    val df = Seq(
      ("m", "api", "i1", None, 2.0, 1L),
      ("m", "api", "i2", None, 3.0, 2L),
      ("m", "web", "i9", None, 4.0, 3L), // no matching info series
      ("target_info", "api", "i1", Some("us"), 1.0, 4L),
      ("target_info", "api", "i2", Some("eu"), 1.0, 5L),
      ("custom_info", "api", "i1", Some("zz"), 1.0, 6L))
      .toDF("__name__", "job", "instance", "cluster", "value", "sample_id")
      .withColumn("ts_ms", lit(t))
      .withColumn("series_hash",
        xxhash64($"__name__", $"job", $"instance", coalesce($"cluster", lit(""))))
    def ctx(exp: Boolean) =
      Compiler.Ctx(df, t, t, 1000L, experimentalFunctions = exp)
    // flag off: loud refusal, like Prometheus without the feature flag
    assertThrows[ParseException](
      Compiler.compile(Parser.parse("""info({__name__="m"})"""), ctx(false)))
    def run(q: String) =
      Compiler.compile(Parser.parse(q), ctx(true))
        .select($"job", $"instance", $"cluster", $"value").collect()
        .map(r => (r.getString(0), r.getString(1), Option(r.getString(2)),
          r.getDouble(3))).toSet
    // default info metric: data label `cluster` rides in; unmatched samples
    // pass through unchanged
    assert(run("""info({__name__="m"})""") == Set(
      ("api", "i1", Some("us"), 2.0),
      ("api", "i2", Some("eu"), 3.0),
      ("web", "i9", None, 4.0)))
    // explicit info selector picks the other info metric
    assert(run("""info({__name__="m"}, {__name__="custom_info"})""") == Set(
      ("api", "i1", Some("zz"), 2.0),
      ("api", "i2", None, 3.0),
      ("web", "i9", None, 4.0)))
    // two info series on one identity set: loud error, not silent row fanout
    val dup = df.unionByName(Seq(("target_info", "api", "i1", Some("eu2"), 1.0, 7L))
      .toDF("__name__", "job", "instance", "cluster", "value", "sample_id")
      .withColumn("ts_ms", lit(t))
      .withColumn("series_hash",
        xxhash64($"__name__", $"job", $"instance", coalesce($"cluster", lit("")))))
    val bad = Compiler.compile(Parser.parse("""info({__name__="m"})"""),
      Compiler.Ctx(dup, t, t, 1000L, experimentalFunctions = true))
    val ex = intercept[Exception](bad.collect())
    assert(ex.toString.contains("USER_RAISED_EXCEPTION") ||
      Option(ex.getMessage).exists(_.contains("multiple info series")))
  }

  test("sort_by_label orders output by the named labels") {
    val rows = eval("""sort_by_label({uid!=""}, "__name__", "uid")""")
      .select($"__name__", $"uid").collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq == rows.toSeq.sorted)
    val rowsD = eval("""sort_by_label_desc({uid!=""}, "__name__", "uid")""")
      .select($"__name__", $"uid").collect().map(r => (r.getString(0), r.getString(1)))
    assert(rowsD.toSeq == rowsD.toSeq.sorted.reverse)
  }

  test("histogram_quantile over classic le-labeled bucket series") {
    // cumulative buckets at one instant: 0.1→50, 0.5→80, 1→95, +Inf→100
    // φ=0.9 → rank 90 lands in the le=1 bucket:
    // 0.5 + (1−0.5)·(90−80)/(95−80) = 0.8333…
    val t = TI - 1000L
    val df = Seq(("0.1", 50.0), ("0.5", 80.0), ("1", 95.0), ("+Inf", 100.0))
      .map { case (le, v) => ("lat_bucket", le, t, v, 1L) }
      .toDF("__name__", "le", "ts_ms", "value", "sample_id")
      .withColumn("series_hash", xxhash64($"__name__", $"le"))
    val got = Compiler.compile(
        Parser.parse("""histogram_quantile(0.9, lat_bucket)"""),
        Compiler.Ctx(df, TI, TI, 1000L, DAY))
      .select($"value").as[Double].head()
    assert(math.abs(got - (0.5 + 0.5 * 10.0 / 15.0)) < 1e-12)
    // φ beyond the last finite bucket → highest finite le
    val hi = Compiler.compile(
        Parser.parse("""histogram_quantile(0.99, lat_bucket)"""),
        Compiler.Ctx(df, TI, TI, 1000L, DAY))
      .select($"value").as[Double].head()
    assert(hi == 1.0)
  }

  test("range query grid matches Eval.rangeVectors") {
    val (s, e, st) = (T0 + 9 * DAY, T0 + 11 * DAY, 21600000L)
    val ctx = Compiler.Ctx(samples, s, e, st, DAY)
    val got = Compiler.compile(Parser.parse("""{__name__="click"}"""), ctx)
      .select($"uid", $"step_ms", $"value")
    val want = Eval.rangeVectors(samples, Seq(MatchEq("__name__", "click")), s, e, st, DAY)
      .select($"uid", $"step_ms", $"value")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }
}
