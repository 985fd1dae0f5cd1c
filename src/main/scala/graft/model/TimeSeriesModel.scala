package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The engine's TSDB data model (SURVEY.md §1.4, FIXTURES.md §1-2).
  *
  * The reference stores one row per series in labels.parquet (wide nullable
  * string column per label, ref `schema/schema.go:82-97`) and packed chunk
  * bytes in chunks.parquet. We flatten to a single long **samples** view:
  * `(series_hash, <label columns…>, ts_ms, value)` — every PromQL operator
  * then becomes a native DataFrame op and Parquet+zstd absorbs the storage
  * delta (delta-encoded ts compresses well).
  *
  * The driver's `events` table is the stream-shaped fixture (FIXTURES.md §6):
  * we map `event_type` → `__name__`, `user_id` → label `uid`; `ts` → epoch
  * millis (the reference's timestamp unit); `value` → sample value.
  */
object TimeSeriesModel {

  /** Label columns that identify a series (always includes `__name__`,
    * ref `schema/schema.go:18-22`). */
  val labelNames: Seq[String] = Seq("__name__", "uid")

  /** Long samples view over the events fixture.
    * `series_hash` mirrors `___cf_meta_hash` (xxhash64 of the label set,
    * ref `convert/tsdb.go:132`) — self-consistent, used only engine-side. */
  def samples(events: DataFrame): DataFrame =
    events.select(
      col("event_type").as("__name__"),
      col("user_id").cast("string").as("uid"),
      unix_millis(col("ts")).as("ts_ms"),
      col("value"),
      col("event_id").as("sample_id"), // ingest sequence id: deterministic tie-break
      xxhash64(col("event_type"), col("user_id").cast("string")).as("series_hash"))

  /** The series (labels.parquet analog) view: one row per distinct label set. */
  def series(events: DataFrame): DataFrame =
    samples(events).select((labelNames.map(col) :+ col("series_hash")): _*).distinct()

  /** Missing label ≡ NULL ≡ "" for matcher semantics
    * (ref `search/constraint.go:133-138,177-182`). */
  def labelValue(name: String): Column = coalesce(col(name), lit(""))
}
