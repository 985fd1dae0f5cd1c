package graft.etl

import java.time.LocalDate

/** Incremental conversion planner (ref `convert/plan.go:58-178`): pure
  * day-diff logic, driver-side.
  *
  * Semantics preserved:
  *  - plan = source days minus already-converted days (`planStream` diff);
  *  - newest-first ordering (`convert/plan.go:101`);
  *  - grace period: never plan a day younger than `graceDays`
  *    (`convert/plan.go:45-56`; default 48h → 2 days);
  *  - partial-day guard: the current (possibly still-filling) day is excluded
  *    by the same cutoff (`truncateLastPartialDay`, `plan.go:137-148`);
  *  - soft step limit `maxDays` (`limitSteps`, `plan.go:152-178`).
  */
object Planner {

  final case class Plan(days: Seq[LocalDate]) {
    def isEmpty: Boolean = days.isEmpty
  }

  private val DayMs = 86400000L

  /** Pluggable live-store watermark (the `ThanosBackfillMetaFilter` analog,
    * ref `locate/filter.go:35-96`): `fetch` polls the live store's advertised
    * time range — the reference calls the endpoint's Info RPC each Update
    * loop — and days fully inside the covered range are not planned (the
    * live store still serves them). `overlapMs` shrinks the covered range
    * from the left like the reference's overlap duration, leaving a safety
    * overlap that IS backfilled. As the live store's retention moves `mint`
    * forward, a previously covered day falls out and becomes plannable. */
  final case class LiveStoreWatermark(fetch: () => (Long, Long),
                                      overlapMs: Long = 0L) {
    /** [lo, hi] epoch-ms range currently covered by the live store
      * (ref `filter.go:52`: `min(mint+overlap, maxt)` to `maxt`). */
    def covered(): (Long, Long) = {
      val (mint, maxt) = fetch()
      (math.min(mint + overlapMs, maxt), maxt)
    }
  }

  def planDays(sourceDays: Set[LocalDate], convertedDays: Set[LocalDate],
               today: LocalDate, graceDays: Int = 2, maxDays: Int = 2,
               watermark: Option[LiveStoreWatermark] = None): Plan = {
    val cutoff = today.minusDays(graceDays.toLong) // youngest plannable day (exclusive)
    val wm = watermark.map(_.covered()) // polled once per planning round
    val candidates = sourceDays
      .filter(_.isBefore(cutoff))
      .diff(convertedDays)
      .filterNot { d => // skip days the live store still fully covers
        wm.exists { case (lo, hi) =>
          val ds = d.toEpochDay * DayMs
          ds >= lo && ds + DayMs - 1 <= hi
        }
      }
      .toSeq.sortWith(_.isAfter(_)) // newest first
    Plan(candidates.take(maxDays))
  }

  /** Retention marking (ref `locate/deletion.go:132-169`): dates older than
    * the retention window get a deletion marker; actual deletion happens only
    * after `consistencyDelayMs` (12h default) so in-flight readers drain. */
  def expiredDays(convertedDays: Set[LocalDate], retentionDays: Int,
                  today: LocalDate): Seq[LocalDate] =
    convertedDays.filter(_.isBefore(today.minusDays(retentionDays.toLong)))
      .toSeq.sorted
}
