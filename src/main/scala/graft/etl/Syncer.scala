package graft.etl

import scala.collection.mutable

/** Stateful catalog syncer — the reference's `locate/syncer.go:115-218`
  * semantics on the driver-side catalog:
  *
  *   - each sync loads ONLY (stream, date) entries not already cached
  *     (`s.blocks[streamHash][m.Date]` presence check, syncer.go:139-141);
  *   - streams absent from discovery are evicted wholesale
  *     (syncer.go:186-190), but a date vanishing from a SURVIVING stream is
  *     retained — the reference only `maps.Copy`s additions;
  *   - the queryable view is the flat, mint-sorted block list rebuilt per
  *     sync (syncer.go:199-207).
  *
  * `load` failures abort the sync with state unchanged for the failed entry
  * (the reference returns the first error and drops the whole round).
  */
final class Syncer[B](load: (String, String) => B) {
  private val state = mutable.LinkedHashMap.empty[String, mutable.LinkedHashMap[String, B]]
  private var cachedList: Seq[(String, String, B)] = Seq.empty

  final case class SyncStats(loaded: Int, skipped: Int, droppedStreams: Int)

  /** `discovered`: stream → dates currently visible. Returns load/skip/drop
    * counts; throws (state only partially updated, like the reference's
    * first-error abort) if `load` does. */
  def sync(discovered: Map[String, Seq[String]]): SyncStats = {
    var loaded, skipped = 0
    val dropped = state.keys.filterNot(discovered.contains).toSeq
    dropped.foreach(state.remove)
    discovered.foreach { case (stream, dates) =>
      val perStream = state.getOrElseUpdate(stream, mutable.LinkedHashMap.empty)
      dates.foreach { d =>
        if (perStream.contains(d)) skipped += 1
        else { perStream(d) = load(stream, d); loaded += 1 }
      }
    }
    cachedList = state.iterator.flatMap { case (s, m) =>
      m.iterator.map { case (d, b) => (s, d, b) }
    }.toSeq.sortBy { case (s, d, _) => (d, s) } // date ≙ mint ordering
    SyncStats(loaded, skipped, dropped.size)
  }

  /** Flat date-sorted catalog view (the reference's `s.cached`). */
  def cached: Seq[(String, String, B)] = cachedList
}

/** Driver-side periodic/retry loops — the reference runs discovery, sync and
  * retention on `runutil.Repeat`/`runutil.Retry` tickers
  * (`cmd/convert.go:186-228`, `cmd/serve.go:152-166`). Spark has no executor
  * role here: these are driver loops around batch jobs, so plain JVM
  * scheduling is the faithful (and testable) analog. */
object Loops {
  /** Run `f` every `intervalMs` until `stop()` is true; an exception from
    * `f` aborts the loop (runutil.Repeat's on-error return). Returns the
    * number of completed iterations. */
  def repeat(intervalMs: Long, stop: () => Boolean)(f: () => Unit): Int = {
    var n = 0
    while (!stop()) {
      f()
      n += 1
      if (!stop()) Thread.sleep(intervalMs)
    }
    n
  }

  /** Retry `f` up to `attempts` times with a fixed backoff, rethrowing the
    * last failure (runutil.Retry). */
  def retry[T](attempts: Int, backoffMs: Long)(f: () => T): T = {
    var left = attempts
    while (true) {
      try return f()
      catch {
        case e: Throwable =>
          left -= 1
          if (left <= 0) throw e
          Thread.sleep(backoffMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
