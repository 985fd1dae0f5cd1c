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

  def planDays(sourceDays: Set[LocalDate], convertedDays: Set[LocalDate],
               today: LocalDate, graceDays: Int = 2, maxDays: Int = 2): Plan = {
    val cutoff = today.minusDays(graceDays.toLong) // youngest plannable day (exclusive)
    val candidates = sourceDays
      .filter(_.isBefore(cutoff))
      .diff(convertedDays)
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
