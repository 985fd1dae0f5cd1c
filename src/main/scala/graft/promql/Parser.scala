package graft.promql

/** PromQL AST + recursive-descent parser (the reference delegates parsing to
  * prometheus/promql; we need our own front-end for the serve layer,
  * SURVEY.md §7.1 step 3).
  *
  * Supported grammar (the surface exercised by the reference's test corpus,
  * `db/db_test.go:313-1127`):
  *   - selectors: `metric{l="v", l2!~"re"}`, bare `{l="v"}`, range `[5m]`
  *   - aggregations: sum/avg/min/max/count/stddev/stdvar/topk/bottomk/quantile
  *     with `by (…)` / `without (…)` (prefix or postfix position)
  *   - functions: rate/increase/delta/idelta, <agg>_over_time, math fns,
  *     clamp/clamp_min/clamp_max, label_replace/label_join, histogram_quantile
  *   - binary ops: `+ - * / % ^`, comparisons (`== != > < >= <=`, `bool`),
  *     set ops `and/or/unless`, `on(...)`/`ignoring(...)`, group_left/right
  *   - number literals (float, with s/m/h/d duration suffixes in ranges)
  */
object Ast {
  sealed trait Expr
  final case class NumberLit(v: Double) extends Expr
  final case class StringLit(v: String) extends Expr
  /** `@` modifier target: fixed epoch-ms, or the query range's start/end. */
  sealed trait AtSpec
  final case class AtTime(ms: Long) extends AtSpec
  case object AtStart extends AtSpec
  case object AtEnd extends AtSpec
  final case class Selector(name: Option[String], matchers: Seq[LabelMatcher],
                            rangeMs: Option[Long], offsetMs: Long = 0L,
                            at: Option[AtSpec] = None) extends Expr
  /** `expr[range:resolution]` — inner expr evaluated on a finer grid. */
  final case class Subquery(expr: Expr, rangeMs: Long, resolutionMs: Long,
                            offsetMs: Long = 0L,
                            at: Option[AtSpec] = None) extends Expr
  final case class Call(fn: String, args: Seq[Expr]) extends Expr
  sealed trait Grouping
  case object NoGrouping extends Grouping
  final case class By(labels: Seq[String]) extends Grouping
  final case class Without(labels: Seq[String]) extends Grouping
  final case class Agg(op: String, grouping: Grouping, param: Option[Expr],
                       expr: Expr) extends Expr
  final case class Matching(on: Boolean, labels: Seq[String],
                            groupLeft: Boolean, groupRight: Boolean,
                            include: Seq[String] = Nil)
  final case class BinOp(op: String, lhs: Expr, rhs: Expr,
                         matching: Option[Matching], bool: Boolean) extends Expr
}

final class ParseException(msg: String) extends RuntimeException(msg)

object Parser {
  import Ast._

  private val aggOps = Set("sum", "avg", "min", "max", "count", "stddev",
    "stdvar", "topk", "bottomk", "quantile", "count_values", "group",
    "limitk", "limit_ratio")

  def parse(input: String): Expr = {
    val p = new Parser(input)
    val e = p.parseExpr(0)
    p.skipWs()
    if (!p.eof) throw new ParseException(s"trailing input at ${p.pos}: '${p.rest}'")
    e
  }

  /** `5m`, `1h30m`, `90s`, `1d` → millis. */
  def parseDuration(s: String): Long = {
    val re = "(\\d+)(ms|s|m|h|d|w|y)".r
    val ms = re.findAllMatchIn(s).map { m =>
      val n = m.group(1).toLong
      m.group(2) match {
        case "ms" => n
        case "s" => n * 1000L
        case "m" => n * 60000L
        case "h" => n * 3600000L
        case "d" => n * 86400000L
        case "w" => n * 7L * 86400000L
        case "y" => n * 365L * 86400000L
      }
    }.sum
    if (ms == 0 || !s.matches("(\\d+(ms|s|m|h|d|w|y))+"))
      throw new ParseException(s"invalid duration '$s'")
    ms
  }

  /** Duration EXPRESSION (Prometheus 3.x `--enable-feature=
    * promql-duration-expr`): `+ - * / % ^` with parentheses over duration
    * literals and bare numbers (bare numbers are SECONDS, the PromQL scalar
    * duration convention), e.g. `2*30s`, `1m+(90s-30s)/2`. Arithmetic runs
    * in seconds; the result rounds to ms. Plain literals parse identically
    * to [[parseDuration]], so the classic grammar is a subset. */
  def parseDurationExpr(s: String): Long = {
    val str = s.trim
    var p = 0
    def ws(): Unit = while (p < str.length && str(p).isWhitespace) p += 1
    def peek: Char = if (p >= str.length) ' ' else str(p)
    def bad(msg: String) =
      throw new ParseException(s"$msg in duration expression '$s'")
    def expr(): Double = {
      var v = term(); ws()
      while (peek == '+' || peek == '-') {
        val op = peek; p += 1
        val r = term()
        v = if (op == '+') v + r else v - r
        ws()
      }
      v
    }
    def term(): Double = {
      var v = unary(); ws()
      while (peek == '*' || peek == '/' || peek == '%') {
        val op = peek; p += 1
        val r = unary()
        v = op match { case '*' => v * r; case '/' => v / r; case _ => v % r }
        ws()
      }
      v
    }
    def unary(): Double = {
      ws()
      if (peek == '-') { p += 1; -unary() }
      else if (peek == '+') { p += 1; unary() }
      else {
        val base = primary(); ws()
        if (peek == '^') { p += 1; math.pow(base, unary()) } else base
      }
    }
    def primary(): Double = {
      ws()
      if (peek == '(') {
        p += 1
        val v = expr(); ws()
        if (peek != ')') bad("')' expected")
        p += 1; v
      } else {
        val st = p
        while (p < str.length && (str(p).isLetterOrDigit || str(p) == '.')) p += 1
        val tok = str.substring(st, p)
        if (tok.isEmpty) bad("operand expected")
        if (tok.forall(c => c.isDigit || c == '.')) tok.toDouble // seconds
        else parseDuration(tok) / 1000.0
      }
    }
    val v = expr()
    ws()
    if (p < str.length) bad(s"trailing input '${str.substring(p)}'")
    if (!java.lang.Double.isFinite(v)) bad("non-finite value")
    math.round(v * 1000.0)
  }

  private final class Parser(val in: String) {
    var pos = 0
    def eof: Boolean = pos >= in.length
    def rest: String = in.substring(math.min(pos, in.length))
    def skipWs(): Unit = while (!eof && in(pos).isWhitespace) pos += 1
    def peek: Char = if (eof) '\u0000' else in(pos)

    def err(msg: String) = throw new ParseException(s"$msg at $pos in '$in'")

    private def isIdentStart(c: Char) = c.isLetter || c == '_' || c == ':'
    private def isIdent(c: Char) = c.isLetterOrDigit || c == '_' || c == ':'

    def ident(): String = {
      skipWs()
      if (eof || !isIdentStart(peek)) err("identifier expected")
      val st = pos
      while (!eof && isIdent(in(pos))) pos += 1
      in.substring(st, pos)
    }

    def expect(c: Char): Unit = {
      skipWs()
      if (peek != c) err(s"'$c' expected")
      pos += 1
    }

    def tryConsume(s: String): Boolean = {
      skipWs()
      if (in.startsWith(s, pos)) { pos += s.length; true } else false
    }

    /** keyword = identifier followed by a non-ident char. */
    def tryKeyword(kw: String): Boolean = {
      skipWs()
      if (in.startsWith(kw, pos) &&
        (pos + kw.length >= in.length || !isIdent(in(pos + kw.length)))) {
        pos += kw.length; true
      } else false
    }

    def stringLit(): String = {
      skipWs()
      val q = peek
      if (q != '"' && q != '\'') err("string expected")
      pos += 1
      val sb = new StringBuilder
      while (!eof && in(pos) != q) {
        if (in(pos) == '\\' && pos + 1 < in.length) {
          pos += 1
          sb.append(in(pos) match {
            case 'n' => '\n'; case 't' => '\t'; case '\\' => '\\'
            case '"' => '"'; case '\'' => '\''; case c => c
          })
        } else sb.append(in(pos))
        pos += 1
      }
      if (eof) err("unterminated string")
      pos += 1
      sb.toString
    }

    def number(): Double = {
      skipWs()
      val st = pos
      if (peek == '+' || peek == '-') pos += 1
      // hex literals (PromQL lexer accepts Go int syntax: 0x1f / 0X1F)
      if (!eof && in(pos) == '0' && pos + 1 < in.length &&
        (in(pos + 1) == 'x' || in(pos + 1) == 'X')) {
        pos += 2
        val hs = pos
        while (!eof && (in(pos).isDigit ||
          ('a' <= in(pos).toLower && in(pos).toLower <= 'f'))) pos += 1
        if (pos == hs) err("hex digits expected")
        val v = java.lang.Long.parseLong(in.substring(hs, pos), 16).toDouble
        return if (in(st) == '-') -v else v
      }
      while (!eof && (in(pos).isDigit || in(pos) == '.' || in(pos) == 'e' ||
        in(pos) == 'E' || ((in(pos) == '+' || in(pos) == '-') &&
          (in(pos - 1) == 'e' || in(pos - 1) == 'E')))) pos += 1
      if (pos == st) err("number expected")
      val s = in.substring(st, pos)
      try s.toDouble
      catch { case _: NumberFormatException => err(s"invalid number '$s'") }
    }

    def labelList(): Seq[String] = {
      expect('(')
      skipWs()
      if (tryConsume(")")) return Seq.empty
      val labels = scala.collection.mutable.ArrayBuffer(ident())
      while (tryConsume(",")) labels += ident()
      expect(')')
      labels.toSeq
    }

    def matcherList(): Seq[LabelMatcher] = {
      expect('{')
      skipWs()
      if (tryConsume("}")) return Seq.empty
      def one(): LabelMatcher = {
        val l = ident()
        skipWs()
        val op =
          if (tryConsume("=~")) "=~" else if (tryConsume("!=")) "!="
          else if (tryConsume("!~")) "!~" else if (tryConsume("=")) "="
          else err("matcher op expected")
        val v = stringLit()
        op match {
          case "=" => MatchEq(l, v); case "!=" => MatchNotEq(l, v)
          case "=~" => MatchRe(l, v); case "!~" => MatchNotRe(l, v)
        }
      }
      val ms = scala.collection.mutable.ArrayBuffer(one())
      while (tryConsume(",")) ms += one()
      expect('}')
      ms.toSeq
    }

    /** `[5m]` → Left(range); `[30m:5m]` → Right((range, resolution)). */
    def maybeRange(): Option[Either[Long, (Long, Long)]] = {
      skipWs()
      if (peek != '[') return None
      pos += 1
      val st = pos
      while (!eof && in(pos) != ']') pos += 1
      if (eof) err("unterminated range")
      val d = in.substring(st, pos)
      pos += 1
      // each side is a full duration EXPRESSION (colons never occur inside
      // duration arithmetic, so the subquery split stays a plain split)
      def range(r: String): Long = {
        val ms = parseDurationExpr(r.trim)
        if (ms <= 0) err(s"range must be positive, got ${ms}ms from '$r'")
        ms
      }
      d.split(":", 2) match {
        case Array(r) => Some(Left(range(r)))
        // `foo[30m:]` — resolution omitted — defaults to the evaluation
        // interval; 0 is the sentinel the compiler resolves to ctx.stepMs
        case Array(r, res) if res.trim.isEmpty =>
          Some(Right((range(r), 0L)))
        case Array(r, res) => Some(Right((range(r), range(res))))
      }
    }

    /** `offset [-]dur` and `@ (ts | start() | end())`, each at most once, in
      * either order — PromQL modifier grammar. */
    def modifiers(): (Long, Option[AtSpec]) = {
      var off = 0L
      var at: Option[AtSpec] = None
      var go = true
      while (go) {
        skipWs()
        if (tryKeyword("offset")) {
          skipWs()
          val neg = tryConsume("-")
          skipWs()
          val d =
            if (peek == '(') {
              // parenthesized duration expression: `offset (2*30s)`,
              // `offset -(1h-30m)` — balance parens, then evaluate
              val st = pos
              var depth = 0
              do {
                if (in(pos) == '(') depth += 1
                else if (in(pos) == ')') depth -= 1
                pos += 1
              } while (pos < in.length && depth > 0)
              if (depth != 0) err("unterminated offset expression")
              parseDurationExpr(in.substring(st + 1, pos - 1))
            } else {
              val st = pos
              while (!eof && in(pos).isLetterOrDigit) pos += 1
              parseDuration(in.substring(st, pos))
            }
          off = if (neg) -d else d
        } else if (tryConsume("@")) {
          skipWs()
          at = Some(
            if (tryKeyword("start")) { expect('('); expect(')'); AtStart }
            else if (tryKeyword("end")) { expect('('); expect(')'); AtEnd }
            else {
              // upstream lexes Inf/NaN as number literals here and rejects
              // them with "timestamp out of bounds for @ modifier"
              // (promql/parser: |ts| ≤ MaxInt64 ms) — math.round would fold
              // Inf to Long.MaxValue and NaN to 0 silently
              val neg = tryConsume("-")
              if (!neg) tryConsume("+")
              skipWs()
              val v =
                if (!eof && peek.isLetter) { // Inf/NaN, case-insensitive
                  val st = pos
                  while (!eof && isIdent(in(pos))) pos += 1
                  val id = in.substring(st, pos)
                  if (id.equalsIgnoreCase("inf")) Double.PositiveInfinity
                  else if (id.equalsIgnoreCase("nan")) Double.NaN
                  else err(s"number expected for @ modifier, got '$id'")
                } else number()
              val ts = (if (neg) -v else v) * 1000.0
              if (ts.isNaN || ts.isInfinite ||
                  ts < Long.MinValue.toDouble || ts > Long.MaxValue.toDouble)
                err(s"timestamp out of bounds for @ modifier: $ts")
              AtTime(math.round(ts))
            })
        } else go = false
      }
      (off, at)
    }

    /** selector/postfix tail: range or subquery brackets, then modifiers. */
    def postfix(base: Expr): Expr = {
      maybeRange() match {
        case Some(Left(r)) =>
          base match {
            case s: Selector =>
              val (off, at) = modifiers()
              s.copy(rangeMs = Some(r), offsetMs = off, at = at)
            case _ => err("range selector on non-selector (use [range:resolution] for subqueries)")
          }
        case Some(Right((r, res))) =>
          val (off, at) = modifiers()
          Subquery(base, r, res, off, at)
        case None =>
          base match {
            case s: Selector =>
              val (off, at) = modifiers()
              if (off != 0 || at.nonEmpty) s.copy(offsetMs = off, at = at) else s
            case other => other
          }
      }
    }

    def grouping(): Grouping = {
      if (tryKeyword("by")) By(labelList())
      else if (tryKeyword("without")) Without(labelList())
      else NoGrouping
    }

    def atom(): Expr = {
      skipWs()
      if (peek == '(') { pos += 1; val e = parseExpr(0); expect(')'); return postfix(e) }
      if (peek == '{') { // bare matcher selector
        val ms = matcherList()
        return postfix(Selector(None, ms, None))
      }
      if (peek == '"' || peek == '\'') return StringLit(stringLit())
      if (peek.isDigit || peek == '.') return NumberLit(number())
      if (peek == '+' || peek == '-') {
        // Unary +/-: binds tighter than * /, looser than ^ (PromQL spec), so
        // parse the operand at ^'s level — `-2^2` is -(2^2) = -4. Number
        // literals constant-fold so downstream scalar detection still sees a
        // NumberLit.
        val neg = peek == '-'
        pos += 1
        val e = parseExpr(prec("^"))
        return if (!neg) e else e match {
          case NumberLit(v) => NumberLit(-v)
          case other => BinOp("*", NumberLit(-1.0), other, None, bool = false)
        }
      }
      val id = ident()
      skipWs()
      // PromQL number keywords (case-insensitive): a metric literally named
      // NaN/Inf needs {__name__="NaN"}, as in Prometheus' lexer. Only
      // nan/inf are keywords — a metric named `infinity` stays a selector
      // (promql/parser/lexer.go keywords).
      if (id.equalsIgnoreCase("nan")) return NumberLit(Double.NaN)
      if (id.equalsIgnoreCase("inf")) return NumberLit(Double.PositiveInfinity)
      if (aggOps.contains(id)) {
        // optional prefix grouping: sum by (a) (expr)
        val g1 = grouping()
        expect('(')
        val first = parseExpr(0)
        val (param, body) =
          if (tryConsume(",")) (Some(first), parseExpr(0)) else (None, first)
        expect(')')
        val g2 = if (g1 == NoGrouping) grouping() else g1
        postfix(Agg(id, g2, param, body))
      } else if (peek == '(') {
        pos += 1
        skipWs()
        if (tryConsume(")")) return postfix(Call(id, Seq.empty))
        val args = scala.collection.mutable.ArrayBuffer(parseExpr(0))
        while (tryConsume(",")) args += parseExpr(0)
        expect(')')
        postfix(Call(id, args.toSeq))
      } else if (peek == '{') {
        postfix(Selector(Some(id), matcherList(), None))
      } else {
        postfix(Selector(Some(id), Seq.empty, None))
      }
    }

    /** precedence climbing; levels per PromQL spec. */
    private val prec: Map[String, Int] = Map(
      "or" -> 1, "and" -> 2, "unless" -> 2,
      "==" -> 3, "!=" -> 3, ">" -> 3, "<" -> 3, ">=" -> 3, "<=" -> 3,
      "+" -> 4, "-" -> 4, "*" -> 5, "/" -> 5, "%" -> 5, "atan2" -> 5, "^" -> 6)

    def peekOp(): Option[String] = {
      skipWs()
      val twoChar = Seq("==", "!=", ">=", "<=")
      twoChar.find(in.startsWith(_, pos))
        .orElse(Seq("+", "-", "*", "/", "%", "^", ">", "<")
          .find(s => in.startsWith(s, pos)))
        .orElse(Seq("and", "or", "unless", "atan2").find(kw =>
          in.startsWith(kw, pos) &&
            (pos + kw.length >= in.length || !isIdent(in(pos + kw.length)))))
    }

    def parseExpr(minPrec: Int): Expr = {
      var lhs = atom()
      var continue = true
      while (continue) {
        peekOp() match {
          case Some(op) if prec(op) >= minPrec =>
            pos += op.length
            val bool = tryKeyword("bool")
            val matching = {
              val on = tryKeyword("on")
              val ignoring = !on && tryKeyword("ignoring")
              if (on || ignoring) {
                val labels = labelList()
                val gl = tryKeyword("group_left")
                val gr = !gl && tryKeyword("group_right")
                // group_left(lbls): carry labels copied from the "one" side
                val inc = if ((gl || gr) && { skipWs(); peek == '(' }) labelList()
                          else Seq.empty
                Some(Matching(on, labels, gl, gr, inc))
              } else None
            }
            // all PromQL operators are left-associative except `^` (spec:
            // 2 ^ 3 ^ 2 ≡ 2 ^ (3 ^ 2)) — same-precedence recursion keeps ^ right
            val rhs = parseExpr(if (op == "^") prec(op) else prec(op) + 1)
            lhs = BinOp(op, lhs, rhs, matching, bool)
          case _ => continue = false
        }
      }
      lhs
    }
  }
}
