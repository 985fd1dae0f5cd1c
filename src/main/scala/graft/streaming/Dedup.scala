package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming exact deduplication — the incremental form of the batch
  * `dd_exact` pipeline operator (and the reference's stateful "already
  * converted" dedup, `locate/syncer.go:115-218`, lifted to record grain).
  *
  * `dropDuplicatesWithinWatermark` keeps one state entry per key seen within
  * the lateness horizon, so state size is bounded by arrival-rate × delay
  * instead of growing with history — the property that makes exactly-once
  * content dedup viable on an unbounded 100 TB/day feed. Duplicates arriving
  * later than the watermark delay are out of contract (they would need
  * unbounded state; route them to a periodic batch `dd_exact` sweep).
  */
object Dedup {

  /** @param events streaming frame containing `tsCol` (event-time timestamp)
    * @param keyCols content-identity columns (e.g. a document content hash)
    * @param delay   lateness horizon, e.g. "1 hour" */
  def exactOnce(events: DataFrame, keyCols: Seq[String], tsCol: String,
                delay: String): DataFrame =
    events.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)
}
