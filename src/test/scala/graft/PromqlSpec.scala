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

  test("rate over range vector matches manual computation") {
    // single window (t-1d, t] per series: rate = (last-first+resets)/dt
    val got = eval("rate(purchase[1d])").select($"uid", $"value")
    val base = samples
      .filter($"__name__" === "purchase" && $"ts_ms" > TI - DAY && $"ts_ms" <= TI)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"series_hash").orderBy($"ts_ms", $"sample_id")
    // prev within the full window = prev within this filtered set
    val want = base
      .withColumn("prev", lag($"value", 1).over(w))
      .groupBy($"uid")
      .agg(count(lit(1)).as("n"), min($"ts_ms").as("ft"), max($"ts_ms").as("lt"),
        min_by($"value", $"ts_ms").as("fv"), max_by($"value", $"ts_ms").as("lv"),
        sum(when($"prev".isNotNull && $"value" < $"prev", $"prev").otherwise(0.0)
          .cast(graft.functions.Det.dec)).cast("double").as("resets"))
      .filter($"n" >= 2)
      .select($"uid", (($"lv" - $"fv" + $"resets") / (($"lt" - $"ft").cast("double") / 1000.0)).as("value"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    assert(got.count() > 0)
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
