package graft.promql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PromQL label matchers compiled to Catalyst predicates.
  *
  * The reference compiles matchers to page-pruned Parquet constraints
  * (`search/constraint.go:32-67`); on Spark the same matchers become `Column`
  * predicates that Catalyst pushes into the vectorized Parquet scan
  * (row-group + page-index + bloom + dictionary pruning are built in).
  *
  * Semantics preserved from the reference:
  *  - missing label ≡ "" — a matcher on a NULL cell, or on a label column that
  *    does not exist in the schema at all, evaluates against ""
  *    (`search/constraint.go:133-138,177-182`, `search/search.go:106-113`);
  *  - `=~` / `!~` are fully anchored (RE2 `^(?:re)$`) — we anchor explicitly;
  *  - a regex that is a plain literal alternation `a|b|c` is rewritten to a
  *    set match (`search/constraint.go:45-49`) → `isin(...)`, which Catalyst's
  *    `OptimizeIn` and the Parquet reader can push down (plain `rlike` cannot
  *    be pushed).
  */
sealed trait LabelMatcher {
  def label: String
  /** Compile to a Catalyst predicate over the given samples/series view. */
  def toPredicate(df: DataFrame): Column
  /** Driver-side evaluation against a plain label value — the analog of
    * Prometheus' `Matcher.Matches`, used where no DataFrame is in play
    * (e.g. external-label filtering during TSDB block discovery,
    * `locate/discover.go:602-611`). Missing label ≡ "" is the caller's
    * contract: pass "" for absent labels. */
  def matches(value: String): Boolean
}

final case class MatchEq(label: String, value: String) extends LabelMatcher {
  /** `coalesce(col,'') === v` is semantically right but the coalesce blocks
    * Parquet filter pushdown. Emit the equivalent null-safe form from
    * pushable primitives instead: the translated `IsNotNull + EqualTo` (or
    * `IsNull OR EqualTo` for the empty string) reaches the scan and prunes
    * row groups/pages/bloom on sorted label columns — the Spark analog of the
    * reference's equal-constraint page pruning (search/constraint.go:122). */
  def toPredicate(df: DataFrame): Column =
    if (!df.columns.contains(label)) lit(value.isEmpty)
    else if (value.isEmpty) col(label).isNull || col(label) === ""
    else col(label).isNotNull && col(label) === value
  def matches(v: String): Boolean = v == value
}

final case class MatchNotEq(label: String, value: String) extends LabelMatcher {
  def toPredicate(df: DataFrame): Column =
    if (!df.columns.contains(label)) lit(value.nonEmpty)
    else if (value.isEmpty) col(label).isNotNull && col(label) =!= ""
    else col(label).isNull || col(label) =!= value
  def matches(v: String): Boolean = v != value
}

final case class MatchRe(label: String, pattern: String) extends LabelMatcher {
  def toPredicate(df: DataFrame): Column =
    Matchers.regexPredicate(df, label, pattern, negate = false)
  private lazy val re = ("^(?:" + pattern + ")$").r
  def matches(v: String): Boolean = re.matches(v)
}

final case class MatchNotRe(label: String, pattern: String) extends LabelMatcher {
  def toPredicate(df: DataFrame): Column =
    Matchers.regexPredicate(df, label, pattern, negate = true)
  private lazy val re = ("^(?:" + pattern + ")$").r
  def matches(v: String): Boolean = !re.matches(v)
}

object Matchers {

  /** Missing label ≡ NULL ≡ "": unknown columns fold to the constant "",
    * which Catalyst then constant-folds through the whole predicate —
    * the analog of the reference vetoing/consuming matchers on absent
    * columns before the scan (`search/search.go:356-376`). */
  def labelValue(df: DataFrame, name: String): Column =
    if (df.columns.contains(name)) coalesce(col(name), lit("")) else lit("")

  /** Literal alternation detector: `a|b|c` with no other regex metacharacters.
    * Mirrors the reference's set-match extraction (`search/constraint.go:45-49`,
    * via Prometheus' `FastRegexMatcher.SetMatches`). */
  private val meta = ".+*?()[]{}^$\\".toSet
  def setMatches(pattern: String): Option[Seq[String]] = {
    if (pattern.isEmpty) None
    // split limit -1: `a|` has the EMPTY string as an alternative (matches a
    // missing label); Java's default split drops trailing empties, which
    // silently turned `x=~"a|"` into `x=~"a"`
    else if (pattern.forall(c => !meta.contains(c)))
      Some(pattern.split("\\|", -1).toSeq)
    else None
  }

  def regexPredicate(df: DataFrame, label: String, pattern: String,
                     negate: Boolean): Column = {
    val pos = setMatches(pattern) match {
      case Some(values) if df.columns.contains(label) =>
        // null-safe IN from pushable primitives (see MatchEq)
        if (values.contains("")) col(label).isNull || col(label).isin(values: _*)
        else col(label).isNotNull && col(label).isin(values: _*)
      case _ =>
        labelValue(df, label).rlike("^(?:" + pattern + ")$") // anchored, RE2-style
      }
    if (negate) !pos else pos
  }

  /** AND of all matchers — the reference evaluates cheapest (sorted-column)
    * constraints first (`search/constraint.go:78-104`); with Catalyst, filter
    * ordering is the optimizer's job and data layout does the pruning. */
  def compile(df: DataFrame, matchers: Seq[LabelMatcher]): Column =
    matchers.map(_.toPredicate(df)).reduceOption(_ && _).getOrElse(lit(true))

  /** Matcher predicate over a labels MAP column (missing key ≡ "") — the
    * refs-level form the open-bucket TSDB source prunes with BEFORE any
    * segment I/O: a ref whose label map fails every selector never reaches
    * the chunk fetch (the reference gets the same effect from
    * `PostingsForMatchers` when serving raw blocks). */
  def mapPredicate(labels: Column, m: LabelMatcher): Column = {
    val v = coalesce(try_element_at(labels, lit(m.label)), lit(""))
    m match {
      case MatchEq(_, value)    => v === value
      case MatchNotEq(_, value) => v =!= value
      case MatchRe(_, p)        => mapRegex(v, p, negate = false)
      case MatchNotRe(_, p)     => mapRegex(v, p, negate = true)
    }
  }

  /** Regex over an already-coalesced map value: the same set-match
    * extraction the column path uses (P3) — `=~"a|b|c"` evaluates as an
    * `isin` instead of a per-row regex. On a million-ref cached scan the
    * regex engine is the constant factor; `v` is never NULL here so the
    * empty alternative needs no null special-casing. */
  private def mapRegex(v: Column, pattern: String, negate: Boolean): Column = {
    val pos = setMatches(pattern) match {
      case Some(values) => v.isin(values: _*)
      case None         => v.rlike("^(?:" + pattern + ")$")
    }
    if (negate) !pos else pos
  }

  /** OR over selector matcher sets (AND within a set) on a labels map —
    * the sound query-wide pushdown: a series can reach a query only by
    * satisfying at least ONE of its selectors' full matcher sets. No sets
    * (or an empty set) → `true`: nothing may be pruned. */
  def mapSetsPredicate(labels: Column, sets: Seq[Seq[LabelMatcher]]): Column =
    sets.map(s => s.map(mapPredicate(labels, _)).reduceOption(_ && _)
        .getOrElse(lit(true)))
      .reduceOption(_ || _).getOrElse(lit(true))
}
