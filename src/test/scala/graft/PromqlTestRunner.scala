package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.promql.{Compiler, Parser}

/** The mini promqltest runner extracted from [[PromqlGoldenSpec]] so other
  * suites (the upstream-transcription corpus, [[PromqlUpstreamSpec]]) can
  * speak the same `load`/`eval instant`/`eval range`/`eval_fail`/`clear`
  * grammar (ref db/db_test.go:53-116 runs the upstream corpus wholesale).
  */
trait PromqlTestRunner extends SparkSpec {
  // ----------------------------------------------------------- mini parser
  /** Native-histogram sample literal, upstream promqltest notation
    * `{{schema:0 count:4 sum:5 buckets:[1 2 1] offset:0 n_buckets:[…]
    * n_offset:… z_bucket:… z_bucket_w:…}}` (prometheus/promql/promqltest
    * histogram series syntax), mapped onto the engine's `h` struct
    * ([[graft.promql.NativeHistograms]] model: pos/neg idx i covers
    * (base^(i-1), base^i] / [-base^i, -base^(i-1))). */
  protected case class Hist(cnt: Double, hsum: Double, sch: Int, zthr: Double,
                          zcnt: Double, pos: Seq[(Int, Double)],
                          neg: Seq[(Int, Double)],
                          cb: Seq[Double] = Nil) // NHCB custom bounds
  protected case class Loaded(labels: Map[String, String], points: Seq[(Long, Double)],
                            hists: Seq[(Long, Hist)] = Nil)
  protected case class EvalCase(atMs: Long, query: String,
                              expected: Seq[(Map[String, String], Double)],
                              expectedH: Seq[(Map[String, String], Hist)] = Nil)
  protected case class RangeCase(startMs: Long, endMs: Long, stepMs: Long, query: String,
                               expected: Seq[(Map[String, String], Seq[Option[Double]])],
                               expectedH: Seq[(Map[String, String], Seq[Option[Hist]])] = Nil)

  protected def parseLabels(s: String): Map[String, String] =
    if (s.trim.isEmpty) Map.empty
    else s.split(",").map { kv =>
      val Array(k, v) = kv.split("=", 2)
      k.trim -> v.trim.stripPrefix("\"").stripSuffix("\"")
    }.toMap

  protected def parseHistLiteral(body: String): Hist = {
    val kv = "(\\w+):(\\[[^\\]]*\\]|\\S+)".r
      .findAllMatchIn(body).map(m => m.group(1) -> m.group(2)).toMap
    def num(k: String) = kv.get(k).map(_.toDouble).getOrElse(0.0)
    def arr(k: String): Seq[Double] = kv.get(k).toSeq.flatMap(
      _.stripPrefix("[").stripSuffix("]").trim match {
        case "" => Nil
        case s => s.split("\\s+").toSeq.map(_.toDouble)
      })
    def side(bk: String, ok: String): Seq[(Int, Double)] = {
      val off = kv.get(ok).map(_.toInt).getOrElse(0)
      arr(bk).zipWithIndex.collect { case (c, i) if c != 0.0 => (off + i, c) }
    }
    Hist(num("count"), num("sum"), kv.get("schema").map(_.toInt).getOrElse(0),
      num("z_bucket_w"), num("z_bucket"),
      side("buckets", "offset"), side("n_buckets", "n_offset"),
      arr("custom_values"))
  }

  protected def parseSeries(line: String, stepMs: Long): Loaded = {
    // a label set exists only when '{' appears before the first whitespace;
    // otherwise any brace belongs to a `{{…}}` histogram value literal
    // (e.g. upstream's bare `empty_histogram {{}}`)
    val firstBrace = line.indexOf('{')
    val wsIdx = line.indexWhere(_.isWhitespace)
    val (sel, vals) =
      if (firstBrace >= 0 && (wsIdx < 0 || firstBrace < wsIdx))
        line.splitAt(line.indexOf('}') + 1)
      else (line.split("\\s+", 2)(0), line.split("\\s+", 2)(1))
    val (name, lblStr) =
      if (sel.contains("{")) (sel.takeWhile(_ != '{'),
        sel.dropWhile(_ != '{').stripPrefix("{").stripSuffix("}"))
      else (sel, "")
    val labels0 = parseLabels(lblStr)
    val labels = if (name.trim.nonEmpty) labels0 + ("__name__" -> name.trim) else labels0
    if (vals.contains("{{")) { // native-histogram series: {{…}} sample literals
      val toks = "\\{\\{[^}]*\\}\\}(?:x\\d+)?|\\S+".r.findAllIn(vals.trim).toSeq
      var idx = 0
      val hs = Seq.newBuilder[(Long, Hist)]
      toks.foreach {
        case "_" => idx += 1
        case t if t.startsWith("{{") =>
          val e = t.indexOf("}}")
          val rep = if (t.length > e + 2) t.substring(e + 3).toInt + 1 else 1
          val h = parseHistLiteral(t.substring(2, e))
          (1 to rep).foreach { _ => hs += ((idx * stepMs, h)); idx += 1 }
        case other =>
          throw new IllegalArgumentException(s"mixed float/histogram series: $other")
      }
      return Loaded(labels, Nil, hs.result())
    }
    val expand = "([-0-9.]+)\\+([-0-9.]+)x(\\d+)".r
    val points = vals.trim match {
      case expand(a, b, n) =>
        (0 to n.toInt).map(i => (i * stepMs, a.toDouble + i * b.toDouble))
      case list => list.split("\\s+").toSeq.zipWithIndex.flatMap { case (v, i) =>
        v match {
          case "_" => None // gap: no sample at this step
          case "stale" => Some((i * stepMs, graft.functions.IsStale.StaleNaN))
          case "NaN" => Some((i * stepMs, Double.NaN))
          case _ => Some((i * stepMs, v.toDouble))
        }
      }
    }
    Loaded(labels, points)
  }

  /** One promqltest section: the series loaded since the last `clear` plus
    * the evals that ran against them — upstream files reset state with
    * `clear` between scenarios, and each segment here gets its own samples
    * frame the same way. */
  /** `eval_fail instant at <t> <q>` — the query must error; optional
    * `expected_fail_message <substring>` / `expected_fail_regexp <re>`
    * lines pin the message, like upstream promqltest. */
  protected case class FailCase(atMs: Long, query: String,
                              msg: Option[String], re: Option[String])

  protected case class Segment(loaded: Seq[Loaded], evals: Seq[EvalCase],
                             ranges: Seq[RangeCase], fails: Seq[FailCase])

  /** promqltest allows `at 0s`; PromQL durations are strictly positive. */
  private def durOrZero(x: String): Long =
    if (x == "0s" || x == "0") 0L else Parser.parseDuration(x)

  protected def parseSegments(text: String): Seq[Segment] = {
    val lines = text.linesIterator.map(_.stripTrailing()).filter(_.nonEmpty).toSeq
    var stepMs = 10000L
    val segments = scala.collection.mutable.ArrayBuffer[Segment]()
    var loaded = scala.collection.mutable.ArrayBuffer[Loaded]()
    var evals = scala.collection.mutable.ArrayBuffer[EvalCase]()
    var ranges = scala.collection.mutable.ArrayBuffer[RangeCase]()
    var fails = scala.collection.mutable.ArrayBuffer[FailCase]()
    def flush(): Unit =
      if (loaded.nonEmpty || evals.nonEmpty || ranges.nonEmpty || fails.nonEmpty) {
        segments += Segment(loaded.toSeq, evals.toSeq, ranges.toSeq, fails.toSeq)
        loaded = scala.collection.mutable.ArrayBuffer[Loaded]()
        evals = scala.collection.mutable.ArrayBuffer[EvalCase]()
        ranges = scala.collection.mutable.ArrayBuffer[RangeCase]()
        fails = scala.collection.mutable.ArrayBuffer[FailCase]()
      }
    var i = 0
    while (i < lines.length) {
      val l = lines(i)
      if (l.trim == "clear") { flush(); i += 1 }
      else if (l.startsWith("eval_fail instant at ")) {
        val rest = l.stripPrefix("eval_fail instant at ")
        val at = durOrZero(rest.takeWhile(!_.isWhitespace))
        val q = rest.dropWhile(!_.isWhitespace).trim
        var msg: Option[String] = None; var re: Option[String] = None
        i += 1
        while (i < lines.length && lines(i).startsWith("  ")) {
          val e = lines(i).trim
          if (e.startsWith("expected_fail_message "))
            msg = Some(e.stripPrefix("expected_fail_message "))
          else if (e.startsWith("expected_fail_regexp "))
            re = Some(e.stripPrefix("expected_fail_regexp "))
          i += 1
        }
        fails += FailCase(at, q, msg, re)
      } else if (l.startsWith("load ")) {
        stepMs = Parser.parseDuration(l.stripPrefix("load ").trim)
        i += 1
        while (i < lines.length && lines(i).startsWith("  ")) {
          loaded += parseSeries(lines(i).trim, stepMs)
          i += 1
        }
      } else if (l.startsWith("eval instant at ")) {
        val rest = l.stripPrefix("eval instant at ")
        val at = durOrZero(rest.takeWhile(!_.isWhitespace))
        val q = rest.dropWhile(!_.isWhitespace).trim
        val exp = scala.collection.mutable.ArrayBuffer[(Map[String, String], Double)]()
        val expH = scala.collection.mutable.ArrayBuffer[(Map[String, String], Hist)]()
        i += 1
        while (i < lines.length && lines(i).startsWith("  ")) {
          val e = lines(i).trim
          val lbl = parseLabels(e.substring(1, e.indexOf('}')))
          val v = e.substring(e.indexOf('}') + 1).trim
          if (v.startsWith("{{"))
            expH += ((lbl, parseHistLiteral(v.stripPrefix("{{").stripSuffix("}}"))))
          else exp += ((lbl, v match {
            case "NaN" => Double.NaN
            case "Inf" | "+Inf" => Double.PositiveInfinity
            case "-Inf" => Double.NegativeInfinity
            case _ => v.toDouble
          }))
          i += 1
        }
        evals += EvalCase(at, q, exp.toSeq, expH.toSeq)
      } else if (l.startsWith("eval range from ")) {
        // `eval range from <start> to <end> step <step> <query>`
        val toks = l.stripPrefix("eval range from ").split("\\s+", 6)
        require(toks(1) == "to" && toks(3) == "step", s"bad range header: $l")
        // promqltest range bounds allow 0s; PromQL durations are positive
        def dur(x: String) = if (x == "0s") 0L else Parser.parseDuration(x)
        val (s0, e0, st0) = (dur(toks(0)), dur(toks(2)), dur(toks(4)))
        val q = toks(5).trim
        val exp = scala.collection.mutable.ArrayBuffer[(Map[String, String], Seq[Option[Double]])]()
        val expH = scala.collection.mutable.ArrayBuffer[(Map[String, String], Seq[Option[Hist]])]()
        i += 1
        while (i < lines.length && lines(i).startsWith("  ")) {
          val e = lines(i).trim
          val lbl = parseLabels(e.substring(1, e.indexOf('}')))
          val body = e.substring(e.indexOf('}') + 1).trim
          if (body.contains("{{")) { // histogram-valued step expectations
            val vs = "\\{\\{[^}]*\\}\\}(?:x\\d+)?|\\S+".r.findAllIn(body).toSeq
              .flatMap {
                case "_" => Seq(None)
                case t if t.startsWith("{{") =>
                  val e2 = t.indexOf("}}")
                  val rep = if (t.length > e2 + 2) t.substring(e2 + 3).toInt + 1 else 1
                  Seq.fill(rep)(Some(parseHistLiteral(t.substring(2, e2))))
                case other => throw new IllegalArgumentException(
                  s"mixed float/histogram range expectation: $other")
              }
            expH += ((lbl, vs))
          } else {
            val vs = body.split("\\s+").toSeq.map {
              case "_" => None
              case "NaN" => Some(Double.NaN)
              case v => Some(v.toDouble)
            }
            exp += ((lbl, vs))
          }
          i += 1
        }
        ranges += RangeCase(s0, e0, st0, q, exp.toSeq, expH.toSeq)
      } else i += 1
    }
    flush()
    segments.toSeq
  }

  import org.apache.spark.sql.functions._

  protected val hType = "struct<cnt:double,hsum:double,sch:int,zthr:double," +
    "zcnt:double,pos:array<struct<idx:int,c:double>>," +
    "neg:array<struct<idx:int,c:double>>,cb:array<double>>"

  protected def bucketArr(b: Seq[(Int, Double)]): org.apache.spark.sql.Column =
    if (b.isEmpty) array().cast("array<struct<idx:int,c:double>>")
    else array(b.map { case (i, c) =>
      struct(lit(i).as("idx"), lit(c).as("c")) }: _*)

  protected def hCol(h: Hist): org.apache.spark.sql.Column = struct(
    lit(h.cnt).as("cnt"), lit(h.hsum).as("hsum"), lit(h.sch).as("sch"),
    lit(h.zthr).as("zthr"), lit(h.zcnt).as("zcnt"),
    bucketArr(h.pos).as("pos"), bucketArr(h.neg).as("neg"),
    (if (h.cb.isEmpty) lit(null).cast("array<double>")
     else array(h.cb.map(lit): _*).cast("array<double>")).as("cb"))

  protected def toSamples(loaded: Seq[Loaded]) = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val lblNames = loaded.flatMap(_.labels.keys).distinct.sorted
    val anyH = loaded.exists(_.hists.nonEmpty)
    val dfs = loaded.zipWithIndex.map { case (s, si) =>
      val base0 =
        if (s.hists.nonEmpty)
          s.hists.map { case (ts, h) =>
            Seq(ts).toDF("ts_ms").withColumn("value", lit(1.0))
              .withColumn("h", hCol(h))
          }.reduce(_ unionByName _)
        else {
          val f = s.points.toDF("ts_ms", "value")
          if (anyH) f.withColumn("h", lit(null).cast(hType)) else f
        }
      val base = base0
        .withColumn("sample_id", lit(si * 100000L) + monotonically_increasing_id())
        .withColumn("series_hash", lit(si.toLong))
      lblNames.foldLeft(base) { (df, l) =>
        df.withColumn(l, s.labels.get(l).map(lit).getOrElse(lit(null).cast("string")))
      }
    }
    dfs.reduce(_ unionByName _)
  }

  protected def checkInstant(samples: DataFrame, evals: Seq[EvalCase],
                             experimental: Boolean = false): Seq[String] =
    evals.flatMap { e =>
      // compileServing: identical to compile except whole-query histogram
      // shapes keep their histogram samples (__graft_h) for comparison
      // against `{{…}}` expectations, like promqltest result matching
      val df = Compiler.compileServing(Parser.parse(e.query),
        Compiler.Ctx(samples, e.atMs, e.atMs, 1000L, lookbackMs = 300000L,
          experimentalFunctions = experimental))
      val hasH = df.columns.contains("__graft_h")
      val lbls = Compiler.labelCols(df).filterNot(_ == "__graft_h")
      def histOf(r: Row): Option[Hist] =
        if (!hasH || r.isNullAt(r.fieldIndex("__graft_h"))) None
        else {
          val h = r.getAs[Row]("__graft_h")
          def side(f: String): Seq[(Int, Double)] =
            h.getAs[scala.collection.Seq[Row]](f).toSeq
              .map(b => (b.getAs[Int]("idx"), b.getAs[Double]("c")))
          Some(Hist(h.getAs[Double]("cnt"), h.getAs[Double]("hsum"),
            h.getAs[Int]("sch"), h.getAs[Double]("zthr"),
            h.getAs[Double]("zcnt"), side("pos"), side("neg"),
            Option(h.getAs[scala.collection.Seq[Double]]("cb"))
              .map(_.toSeq).getOrElse(Nil)))
        }
      val rows = df.collect().toSeq.map { r =>
        (lbls.flatMap(l => Option(r.getAs[Any](l)).map(v => l -> v.toString)).toMap,
          r.getAs[Any]("value") match { case d: Double => d; case l: Long => l.toDouble; case null => -987654.25 },
          histOf(r))
      }
      val got  = rows.collect { case (l, v, None) => (l, v) }
      val gotH = rows.collect { case (l, _, Some(h)) => (l, h) }
      def eq(a: Double, b: Double) = (a.isNaN && b.isNaN) || a == b || math.abs(a - b) < 1e-9
      def hEq(a: Hist, b: Hist) =
        eq(a.cnt, b.cnt) && eq(a.hsum, b.hsum) && a.sch == b.sch &&
          eq(a.zthr, b.zthr) && eq(a.zcnt, b.zcnt) &&
          a.pos.map(_._1) == b.pos.map(_._1) && a.neg.map(_._1) == b.neg.map(_._1) &&
          a.pos.zip(b.pos).forall(p => eq(p._1._2, p._2._2)) &&
          a.neg.zip(b.neg).forall(p => eq(p._1._2, p._2._2)) &&
          a.cb.size == b.cb.size && a.cb.zip(b.cb).forall(p => eq(p._1, p._2))
      val ok = got.size == e.expected.size && e.expected.forall { case (lbl, v) =>
        got.exists { case (gl, gv) => gl == lbl && eq(gv, v) }
      } && gotH.size == e.expectedH.size && e.expectedH.forall { case (lbl, h) =>
        gotH.exists { case (gl, gh) => gl == lbl && hEq(gh, h) }
      }
      if (ok) None else Some(s"QUERY ${e.query} @${e.atMs}\n  got      ${got ++ gotH}\n  expected ${e.expected ++ e.expectedH}")
    }

  protected def checkFails(samples: DataFrame, fails: Seq[FailCase],
                           experimental: Boolean = false): Seq[String] =
    fails.flatMap { f =>
      val thrown =
        try {
          Compiler.compileServing(Parser.parse(f.query),
            Compiler.Ctx(samples, f.atMs, f.atMs, 1000L, lookbackMs = 300000L,
              experimentalFunctions = experimental)).collect()
          None
        } catch { case e: Throwable => Some(e) }
      thrown match {
        case None => Some(s"EVAL_FAIL ${f.query}: expected an error, query succeeded")
        case Some(e) =>
          val text = e.toString + " " + String.valueOf(e.getMessage)
          if (f.msg.exists(m => !text.contains(m)))
            Some(s"EVAL_FAIL ${f.query}: '$text' missing '${f.msg.get}'")
          else if (f.re.exists(r => r.r.findFirstIn(text).isEmpty))
            Some(s"EVAL_FAIL ${f.query}: '$text' doesn't match /${f.re.get}/")
          else None
      }
    }
  protected def checkRange(samples: DataFrame, ranges: Seq[RangeCase],
                           experimental: Boolean = false): Seq[String] = {
    def eq(a: Double, b: Double) = (a.isNaN && b.isNaN) || a == b || math.abs(a - b) < 1e-9
    def hEq(a: Hist, b: Hist) =
      eq(a.cnt, b.cnt) && eq(a.hsum, b.hsum) && a.sch == b.sch &&
        eq(a.zthr, b.zthr) && eq(a.zcnt, b.zcnt) &&
        a.pos.map(_._1) == b.pos.map(_._1) && a.neg.map(_._1) == b.neg.map(_._1) &&
        a.pos.zip(b.pos).forall(p => eq(p._1._2, p._2._2)) &&
        a.neg.zip(b.neg).forall(p => eq(p._1._2, p._2._2)) &&
        a.cb.size == b.cb.size && a.cb.zip(b.cb).forall(p => eq(p._1, p._2))
    ranges.flatMap { rc =>
      val df = Compiler.compileServing(Parser.parse(rc.query),
        Compiler.Ctx(samples, rc.startMs, rc.endMs, rc.stepMs, lookbackMs = 300000L,
          experimentalFunctions = experimental))
      val hasH = df.columns.contains("__graft_h")
      val lbls = Compiler.labelCols(df).filterNot(c => c == "step_ms" || c == "__graft_h")
      def histOf(r: Row): Option[Hist] =
        if (!hasH || r.isNullAt(r.fieldIndex("__graft_h"))) None
        else {
          val h = r.getAs[Row]("__graft_h")
          def side(f: String): Seq[(Int, Double)] =
            h.getAs[scala.collection.Seq[Row]](f).toSeq
              .map(b => (b.getAs[Int]("idx"), b.getAs[Double]("c")))
          Some(Hist(h.getAs[Double]("cnt"), h.getAs[Double]("hsum"),
            h.getAs[Int]("sch"), h.getAs[Double]("zthr"),
            h.getAs[Double]("zcnt"), side("pos"), side("neg"),
            Option(h.getAs[scala.collection.Seq[Double]]("cb"))
              .map(_.toSeq).getOrElse(Nil)))
        }
      val rows = df.collect().toSeq.map { r =>
        (lbls.flatMap(l => Option(r.getAs[Any](l)).map(v => l -> v.toString)).toMap,
          r.getAs[Long]("step_ms"),
          r.getAs[Any]("value") match { case d: Double => d; case l: Long => l.toDouble; case null => -987654.25 },
          histOf(r))
      }
      val got: Map[Map[String, String], Map[Long, Double]] = rows
        .collect { case (l, t, v, None) => (l, t, v) }
        .groupBy(_._1).map { case (k, rs) => k -> rs.map(t => t._2 -> t._3).toMap }
      val gotH: Map[Map[String, String], Map[Long, Hist]] = rows
        .collect { case (l, t, _, Some(h)) => (l, t, h) }
        .groupBy(_._1).map { case (k, rs) => k -> rs.map(t => t._2 -> t._3).toMap }
      val steps = (rc.startMs to rc.endMs by rc.stepMs).toSeq
      val bad = rc.expected.flatMap { case (lbl, vs) =>
        val series = got.getOrElse(lbl, Map.empty)
        steps.zip(vs).collect {
          case (t, None) if series.contains(t) =>
            s"  $lbl @$t: expected absent, got ${series(t)}"
          case (t, Some(v)) if !series.get(t).exists(eq(_, v)) =>
            s"  $lbl @$t: expected $v, got ${series.get(t)}"
        }
      } ++ rc.expectedH.flatMap { case (lbl, vs) =>
        val series = gotH.getOrElse(lbl, Map.empty)
        steps.zip(vs).collect {
          case (t, None) if series.contains(t) =>
            s"  $lbl @$t: expected absent, got histogram ${series(t)}"
          case (t, Some(h)) if !series.get(t).exists(hEq(_, h)) =>
            s"  $lbl @$t: expected $h, got ${series.get(t)}"
        }
      } ++ got.keySet.diff(rc.expected.map(_._1).toSet).map(k => s"  unexpected series $k") ++
        gotH.keySet.diff(rc.expectedH.map(_._1).toSet).map(k => s"  unexpected histogram series $k")
      if (bad.isEmpty) None
      else Some(s"QUERY ${rc.query}\n" + bad.mkString("\n"))
    }
  }

}
