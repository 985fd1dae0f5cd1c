package graft.etl

import java.nio.file.{Files, Path, Paths}
import scala.collection.mutable
import graft.promql.LabelMatcher

/** TSDB block metadata, the subset of Thanos' `metadata.Meta` that discovery
  * filters on (ref `locate/discover.go:518-651`): ULID, time range,
  * downsample resolution, chunk count, and the Thanos external labels.
  */
final case class TsdbBlockMeta(ulid: String,
                               minTime: Long,
                               maxTime: Long,
                               resolution: Long,
                               numChunks: Long,
                               externalLabels: Map[String, String])

object TsdbBlockMeta {
  /** Parse a Thanos-shaped `meta.json`:
    * `{"ulid":…,"minTime":…,"maxTime":…,"stats":{"numChunks":…},
    *   "thanos":{"labels":{…},"downsample":{"resolution":…}}}`.
    * Missing numeric fields default to 0 (a chunkless/no-stats block is
    * exactly what the discoverer must then skip). */
  def parse(json: String): TsdbBlockMeta = {
    val root = MiniJson.parse(json) match {
      case o: Map[_, _] => o.asInstanceOf[Map[String, Any]]
      case other => throw new IllegalArgumentException(s"meta.json is not an object: $other")
    }
    def obj(m: Map[String, Any], k: String): Map[String, Any] =
      m.get(k).collect { case o: Map[_, _] => o.asInstanceOf[Map[String, Any]] }
        .getOrElse(Map.empty)
    def num(m: Map[String, Any], k: String): Long =
      m.get(k).collect { case d: Double => d.toLong }.getOrElse(0L)
    val thanos = obj(root, "thanos")
    TsdbBlockMeta(
      ulid = root.get("ulid").collect { case s: String => s }.getOrElse(""),
      minTime = num(root, "minTime"),
      maxTime = num(root, "maxTime"),
      resolution = num(obj(thanos, "downsample"), "resolution"),
      numChunks = num(obj(root, "stats"), "numChunks"),
      externalLabels = obj(thanos, "labels").collect { case (k, v: String) => k -> v })
  }
}

/** Stateful TSDB block discoverer — the ingest-side listing job the reference
  * runs before conversion (`TSDBDiscoverer.Discover`,
  * `locate/discover.go:518-651`). Driver-side by design: it lists a bucket
  * prefix and reads tiny sidecar files; no executor work is warranted (at
  * 100 TB the block COUNT is thousands, not billions — the data volume lives
  * inside the blocks, which conversion itself reads distributed).
  *
  * Reference semantics preserved, in order:
  *   1. blocks without `meta.json` are incomplete → skipped (discover.go:547);
  *   2. blocks with a deletion marker are skipped (discover.go:551);
  *   3. metas already cached are NOT re-read (discover.go:555);
  *   4. new metas must match every external-label matcher, with missing
  *      label ≡ "" (discover.go:602-611);
  *   5. downsampled blocks (resolution ≠ 0) are dropped (discover.go:614-616);
  *   6. chunkless blocks cannot be converted → dropped (discover.go:619-621);
  *   7. the merged cache then drops blocks with data newer than
  *      `now - minBlockAge` (too young to be sealed, discover.go:628-630) —
  *      note this re-checks CACHED blocks each round, so a block ages in;
  *   8. blocks that vanished from the bucket are evicted (discover.go:632-635).
  *
  * `readMeta` is injectable for tests / remote stores; the default reads
  * `<root>/<ulid>/meta.json` from the local filesystem.
  */
final class TsdbDiscoverer(root: String,
                           externalLabelMatchers: Seq[LabelMatcher] = Seq.empty,
                           minBlockAgeMs: Long = 0L,
                           now: () => Long = () => System.currentTimeMillis(),
                           readMeta: String => TsdbBlockMeta = TsdbDiscoverer.localRead _) {

  private val cache = mutable.LinkedHashMap.empty[String, TsdbBlockMeta]

  /** One discovery round. Returns counters; throws if a meta read fails
    * (the reference aborts the whole round on the first error). */
  def discover(): DiscoverStats = {
    // bucket listing → block dir → contained file names (discover.go:520-531)
    val listing: Map[String, Set[String]] = listBlocks()

    val complete = listing.collect {
      case (id, files) if files.contains("meta.json") && !files.contains("deletion-mark.json") => id
    }.toSet

    val toRead = complete.filterNot(cache.contains)
    val fresh = toRead.toSeq.sorted.map(id => id -> readMeta(s"$root/$id/meta.json"))

    val admitted = fresh.filter { case (_, m) =>
      externalLabelMatchers.forall(lm => lm.matches(m.externalLabels.getOrElse(lm.label, ""))) &&
        m.resolution == 0L && m.numChunks > 0L
    }
    admitted.foreach { case (id, m) => cache(id) = m }

    // too-young and vanished checks run over the MERGED cache each round
    val cutoff = now() - minBlockAgeMs
    val young = cache.collect { case (id, m) if m.maxTime > cutoff => id }.toSeq
    young.foreach(cache.remove)
    val gone = cache.keys.filterNot(complete.contains).toSeq
    gone.foreach(cache.remove)

    DiscoverStats(read = fresh.size, cachedSkip = (complete -- toRead).size,
      filtered = fresh.size - admitted.size, tooYoung = young.size, vanished = gone.size)
  }

  /** Surviving blocks, minTime-sorted (the converter plans over these). */
  def metas: Seq[TsdbBlockMeta] = cache.values.toSeq.sortBy(m => (m.minTime, m.ulid))

  /** Overall [minTime, maxTime) span of surviving blocks, if any —
    * the reference exports these as sync gauges (discover.go:637-645). */
  def timeRange: Option[(Long, Long)] =
    if (cache.isEmpty) None
    else Some((cache.values.map(_.minTime).min, cache.values.map(_.maxTime).max))

  /** Group surviving metas into per-external-labels streams with the UTC days
    * their blocks cover (`TSDBDiscoverer.Streams`, discover.go:489-516) — the
    * unit conversion plans over. Stream ids come from `Ingest.streamId`, the
    * same id `convert` partitions by, so a discovery round feeds
    * `Syncer.sync(discoverer.streamDays)` directly. */
  def streams: Map[String, TsdbStream] =
    metas.groupBy(m => Ingest.streamId(m.externalLabels)).map { case (id, ms) =>
      id -> TsdbStream(ms.head.externalLabels, ms,
        ms.flatMap(m => TsdbDiscoverer.splitIntoDates(m.minTime, m.maxTime))
          .distinct.sorted)
    }

  /** `stream → days` view of [[streams]], shaped for `Syncer.sync`. */
  def streamDays: Map[String, Seq[String]] =
    streams.map { case (id, s) => id -> s.days }

  private def listBlocks(): Map[String, Set[String]] = {
    val r = Paths.get(root)
    if (!Files.isDirectory(r)) return Map.empty
    val dirs = withList(r)(_.filter(Files.isDirectory(_)))
    dirs.map { d =>
      d.getFileName.toString -> withList(d)(_.map(_.getFileName.toString)).toSet
    }.toMap
  }

  private def withList[T](p: Path)(f: Iterator[Path] => Iterator[T]): Seq[T] = {
    val s = Files.list(p)
    try f(s.iterator().asInstanceOf[java.util.Iterator[Path]].asScala).toSeq
    finally s.close()
  }

  private implicit class IterOps[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext: Boolean = it.hasNext
      def next(): A = it.next()
    }
  }
}

/** Counters from one discovery round. */
final case class DiscoverStats(read: Int, cachedSkip: Int, filtered: Int,
                               tooYoung: Int, vanished: Int)

/** One per-external-labels group of discovered blocks (the reference's
  * `schema.TSDBBlocksStream`, discover.go:500-513). */
final case class TsdbStream(externalLabels: Map[String, String],
                            metas: Seq[TsdbBlockMeta],
                            days: Seq[String])

object TsdbDiscoverer {
  def localRead(path: String): TsdbBlockMeta =
    TsdbBlockMeta.parse(Files.readString(Paths.get(path)))

  /** UTC days touched by [mint, maxt), first day always included and a maxt
    * landing exactly on midnight NOT opening a new day — the reference's
    * `util.SplitIntoDates` loop (`internal/util/date.go:46-58`). */
  def splitIntoDates(mint: Long, maxt: Long): Seq[String] = {
    val day = 86400000L
    val first = Math.floorDiv(mint, day)
    val b = Seq.newBuilder[String]
    var d = first
    var more = true
    while (more) {
      b += java.time.LocalDate.ofEpochDay(d).toString
      d += 1
      if (d * day >= maxt) more = false
    }
    b.result()
  }
}

/** Minimal recursive-descent JSON reader for driver-side sidecar files
  * (meta.json and friends). Objects → `Map[String, Any]`, arrays →
  * `Vector[Any]`, numbers → `Double`, plus `String`/`Boolean`/`null`.
  * Deliberately tiny: the sandbox build has no JSON dependency, and the
  * sidecars are small, trusted, machine-written files.
  */
object MiniJson {
  def parse(s: String): Any = {
    val p = new P(s)
    val v = p.value()
    p.ws()
    require(p.eof, s"trailing content at ${p.i}")
    v
  }

  private final class P(s: String) {
    var i = 0
    def eof: Boolean = i >= s.length
    def ws(): Unit = while (!eof && s.charAt(i).isWhitespace) i += 1
    private def expect(c: Char): Unit = {
      require(!eof && s.charAt(i) == c, s"expected '$c' at $i")
      i += 1
    }
    def value(): Any = {
      ws()
      require(!eof, "unexpected end of input")
      s.charAt(i) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => str()
        case 't' => lit("true", true)
        case 'f' => lit("false", false)
        case 'n' => lit("null", null)
        case _   => num()
      }
    }
    private def obj(): Map[String, Any] = {
      expect('{'); ws()
      val b = Map.newBuilder[String, Any]
      if (!eof && s.charAt(i) == '}') { i += 1; return b.result() }
      var more = true
      while (more) {
        ws(); val k = str(); ws(); expect(':')
        b += k -> value(); ws()
        if (!eof && s.charAt(i) == ',') i += 1 else more = false
      }
      expect('}')
      b.result()
    }
    private def arr(): Vector[Any] = {
      expect('['); ws()
      val b = Vector.newBuilder[Any]
      if (!eof && s.charAt(i) == ']') { i += 1; return b.result() }
      var more = true
      while (more) {
        b += value(); ws()
        if (!eof && s.charAt(i) == ',') i += 1 else more = false
      }
      expect(']')
      b.result()
    }
    private def str(): String = {
      expect('"')
      val b = new StringBuilder
      while (!eof && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          i += 1
          require(!eof, "dangling escape")
          s.charAt(i) match {
            case '"'  => b += '"'
            case '\\' => b += '\\'
            case '/'  => b += '/'
            case 'b'  => b += '\b'
            case 'f'  => b += '\f'
            case 'n'  => b += '\n'
            case 'r'  => b += '\r'
            case 't'  => b += '\t'
            case 'u'  =>
              require(i + 4 < s.length, "short unicode escape")
              b += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar
              i += 4
            case o => throw new IllegalArgumentException(s"bad escape \\$o at $i")
          }
        } else b += c
        i += 1
      }
      expect('"')
      b.result()
    }
    private def num(): Double = {
      val start = i
      if (!eof && (s.charAt(i) == '-' || s.charAt(i) == '+')) i += 1
      while (!eof && (s.charAt(i).isDigit || "+-.eE".indexOf(s.charAt(i)) >= 0)) i += 1
      require(i > start, s"expected value at $start")
      s.substring(start, i).toDouble
    }
    private def lit[T](word: String, v: T): T = {
      require(s.regionMatches(i, word, 0, word.length), s"expected $word at $i")
      i += word.length
      v
    }
  }
}
