package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.promql._

/** Matcher semantics (ref search/constraint_test.go analog): set-match
  * extraction, anchoring, missing-label ≡ "". */
class MatcherSpec extends SparkSpec {
  import spark.implicits._

  test("set-match extraction mirrors reference FastRegexMatcher.SetMatches") {
    assert(Matchers.setMatches("a|b|c").contains(Seq("a", "b", "c")))
    assert(Matchers.setMatches("click|view").contains(Seq("click", "view")))
    assert(Matchers.setMatches("a.*|b").isEmpty)
    assert(Matchers.setMatches("").isEmpty)
    assert(Matchers.setMatches("a+").isEmpty)
  }

  test("set-match property: literal alternations always extract") {
    val word = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val prop = Prop.forAll(Gen.nonEmptyListOf(word)) { words =>
      val pat = words.mkString("|")
      Matchers.setMatches(pat).contains(pat.split('|').toSeq)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("mapPredicate extracts set matches to IN (no per-row regex on refs scans)") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (Map("x" -> "a"), "a"), (Map("x" -> "b"), "b"),
      (Map("x" -> "z"), "z"), (Map.empty[String, String], "none"))
      .toDF("labels", "tag")
    // r19: the refs-pruning map path compiles =~"a|b|c" through the SAME
    // alternation→IN extraction as the column path (P3) — a cached
    // million-ref scan must evaluate an isin, not an rlike per ref
    val p = Matchers.mapPredicate(col("labels"), MatchRe("x", "a|b"))
    val plan = df.filter(p).queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("like"),
      s"set-match regex leaked into the map path:\n$plan")
    assert(df.filter(p).select("tag").as[String].collect().toSet == Set("a", "b"))
    // negation + missing≡"": x!~"a|b" keeps z AND the label-less ref
    val n = Matchers.mapPredicate(col("labels"), MatchNotRe("x", "a|b"))
    assert(df.filter(n).select("tag").as[String].collect().toSet == Set("z", "none"))
    // the empty alternative selects missing labels on the map path too
    val e = Matchers.mapPredicate(col("labels"), MatchRe("x", "a|"))
    assert(df.filter(e).select("tag").as[String].collect().toSet == Set("a", "none"))
    // non-literal patterns still take the anchored regex
    val r = Matchers.mapPredicate(col("labels"), MatchRe("x", "[ab]"))
    assert(df.filter(r).select("tag").as[String].collect().toSet == Set("a", "b"))
  }

  test("missing label ≡ empty string: eq-empty matches null and absent columns") {
    val df = Seq(("a", Some("x")), ("b", None), ("c", Some(""))).toDF("name", "lbl")
    // null and "" both match lbl=""
    val m = df.filter(MatchEq("lbl", "").toPredicate(df)).select("name").as[String].collect().toSet
    assert(m == Set("b", "c"))
    // a matcher on a column that does not exist matches everything for ""
    val all = df.filter(MatchEq("nope", "").toPredicate(df)).count()
    assert(all == 3)
    // …and nothing for a non-empty value (query veto, ref search/search.go:356)
    val none = df.filter(MatchEq("nope", "x").toPredicate(df)).count()
    assert(none == 0)
  }

  test("driver-side matches() agrees with the Catalyst predicate") {
    // the discovery path evaluates matchers on plain strings; it must never
    // drift from what the same matcher does compiled against a DataFrame
    val word = Gen.listOf(Gen.alphaNumChar).map(_.mkString)
    val pattern = Gen.oneOf(word, word.map(_ + ".*"), Gen.const("a|b|c"),
      word.map(w => s"($w)+"))
    val matcher: Gen[LabelMatcher] = for {
      v <- word
      p <- pattern
      m <- Gen.oneOf[LabelMatcher](MatchEq("lbl", v), MatchNotEq("lbl", v),
        MatchRe("lbl", p), MatchNotRe("lbl", p))
    } yield m
    val prop = Prop.forAll(matcher, Gen.listOfN(8, word)) { (m, values) =>
      val df = values.toDF("lbl")
      val viaSpark = df.filter(m.toPredicate(df)).as[String].collect()
        .groupBy(identity).view.mapValues(_.length).toMap
      val viaDriver = values.filter(m.matches)
        .groupBy(identity).view.mapValues(_.length).toMap
      viaSpark == viaDriver
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }

  test("regex is fully anchored (RE2 semantics)") {
    val df = Seq("purchase", "purchases", "pur").toDF("lbl")
    val got = df.filter(MatchRe("lbl", "purch.se").toPredicate(df)).as[String].collect().toSeq
    assert(got == Seq("purchase"))
    val neg = df.filter(MatchNotRe("lbl", "purch.se").toPredicate(df)).as[String].collect().toSet
    assert(neg == Set("purchases", "pur"))
  }
}
