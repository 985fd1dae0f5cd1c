package graft

import org.apache.spark.sql.functions._
import graft.model.TimeSeriesModel
import graft.plans.PrefixRegexRewrite
import graft.promql.{Matchers, MatchRe, MatchNotRe}
import graft.sources.Tables

/** PrefixRegexRewrite: correctness-preserving, and the rewritten predicate
  * reaches the Parquet scan as a pushed StringStartsWith filter. */
class PlanRuleSpec extends SparkSpec {

  private def withRule[A](body: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ PrefixRegexRewrite
    try body
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == PrefixRegexRewrite)
  }

  test("prefix regex matcher is rewritten to a pushed StartsWith filter") {
    def build() = {
      val ev = Tables(spark, sf()).table("events")
      ev.filter(MatchRe("event_type", "pur.*").toPredicate(ev))
        .select(col("event_id"))
    }
    val before = build().queryExecution.executedPlan.toString
    assert(before.contains("RLIKE") && !before.contains("StartsWith"))
    withRule {
      val plan = build().queryExecution.executedPlan.toString // fresh plan: QE caches
      assert(plan.contains("StartsWith"), plan)
      assert(plan.contains("StringStartsWith"), plan) // pushed to the scan
    }
  }

  test("rewrite preserves results, including negated and non-prefix patterns") {
    val samples = TimeSeriesModel.samples(Tables(spark, sf()).events)
    val queries = Seq(
      Matchers.compile(samples, Seq(MatchRe("__name__", "pur.*"))),
      Matchers.compile(samples, Seq(MatchNotRe("__name__", "cli.*"))),
      Matchers.compile(samples, Seq(MatchRe("__name__", "p.*|cl.*"))), // not a prefix → untouched
      Matchers.compile(samples, Seq(MatchRe("uid", "1.*"))))
    queries.foreach { pred =>
      val plain = samples.filter(pred).count()
      val ruled = withRule(samples.filter(pred).count())
      assert(plain == ruled)
      assert(plain > 0)
    }
  }

  test("NULL labels keep PromQL semantics under the rule (negated prefix must match missing)") {
    import spark.implicits._
    val df = Seq(Some("purchase"), Some("click"), None).toDF("lbl")
    val pred = MatchNotRe("lbl", "pur.*").toPredicate(df)
    def got() = df.filter(pred).select(coalesce(col("lbl"), lit("<null>")))
      .as[String].collect().toSet
    val plain = got()
    val ruled = withRule(got())
    assert(plain == Set("click", "<null>")) // missing ≡ "" matches !~
    assert(ruled == plain)
  }
}
