package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Stateful gap-sessionization over the event stream — the streaming form of
  * the batch `t6_sessionize` query (SURVEY.md §2.9; the reference has no
  * session windows, this is part of the training-pipeline extension surface).
  *
  * `flatMapGroupsWithState` keyed by user: state is the single open session
  * (sessions of one user are sequential, so state is O(1) per key — at 100 TB
  * scale the state store holds one small record per active user, not per
  * event). Closed sessions are emitted as soon as a newer event proves the
  * gap, or when the event-time watermark passes `end + gap` (EventTimeTimeout)
  * — so results are append-only and late data within the watermark delay is
  * still merged.
  */
object Sessionize {
  final case class Ev(user_id: Long, ts: java.sql.Timestamp)
  final case class OpenSess(start: Long, end: Long, n: Long)
  final case class Session(uid: Long, sess_start: Long, sess_end: Long,
                           n_events: Long)

  /** @param events streaming frame with `user_id` (long) + `ts` (timestamp)
    * @param gapMs session gap; a ≥gap silence closes the session
    * @param watermarkDelay lateness tolerated before a session can finalize */
  def sessions(events: DataFrame, gapMs: Long = 1800000L,
               watermarkDelay: String = "0 seconds"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("ts"))
      .withWatermark("ts", watermarkDelay)
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSess, Session](OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) { (uid, evs, state) =>
        if (state.hasTimedOut) { // watermark passed end+gap: finalize
          val s = state.get
          state.remove()
          Iterator.single(Session(uid, s.start, s.end, s.n))
        } else {
          // batch delivery is unordered — sort this batch's events; cross-
          // batch disorder is bounded by the watermark delay
          val ts = evs.map(_.ts.getTime).toArray
          java.util.Arrays.sort(ts)
          val out = scala.collection.mutable.ArrayBuffer.empty[Session]
          var open = state.getOption
          for (t <- ts) open match {
            case Some(o) if t - o.end > gapMs =>
              out += Session(uid, o.start, o.end, o.n)
              open = Some(OpenSess(t, t, 1))
            case Some(o) =>
              open = Some(OpenSess(o.start, math.max(o.end, t), o.n + 1))
            case None =>
              open = Some(OpenSess(t, t, 1))
          }
          open.foreach { o =>
            val wm = state.getCurrentWatermarkMs()
            if (o.end + gapMs <= wm) {
              // finalizing inline: clear any state (and its pending timeout)
              // carried over from a previous batch, or the timed-out path
              // would re-emit this session
              if (state.exists) state.remove()
              out += Session(uid, o.start, o.end, o.n)
            } else { state.update(o); state.setTimeoutTimestamp(o.end + gapMs) }
          }
          out.iterator
        }
      }
  }
}
