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

  /** Replica-aware dedup (ref `search/materialize.go:75` drops the configured
    * replica labels; `db/shard.go:253-268` then keeps the first series per
    * mangled label-set hash and warns about the rest).
    *
    * Spark-first form: per mangled label set, the surviving replica is the
    * lexicographically smallest replica-label tuple — a deterministic
    * stand-in for the reference's arrival order (which is scan-order-defined
    * there, so any stable choice is conformant). Dedup happens at SERIES
    * grain: every sample of the winning replica is kept, duplicate series
    * are dropped whole, like the reference's seen-hash skip. Output drops
    * the replica columns and rehashes `series_hash` over the surviving
    * label set. Plan shape: distinct + hash-agg on mangled labels (partial
    * map-side), then a broadcast-friendly semi-join — no window over a
    * global partition, safe at any series cardinality. */
  def replicaDedup(samples: DataFrame, replicaLabels: Seq[String]): DataFrame = {
    val bookkeeping = Set("ts_ms", "value", "sample_id", "series_hash", "date")
    val lblCols = samples.columns.filterNot(bookkeeping).toSeq
    val keepLbls = lblCols.filterNot(replicaLabels.contains)
    val winners = samples.select(lblCols.map(col): _*).distinct()
      .groupBy(keepLbls.map(col): _*)
      .agg(min(struct(replicaLabels.map(col): _*)).as("__graft_win"))
    val keyEq = keepLbls.map(c => samples(c) <=> winners(c)).reduce(_ && _)
    samples.join(winners,
        keyEq && struct(replicaLabels.map(samples(_)): _*) === winners("__graft_win"),
        "left_semi")
      .drop(replicaLabels: _*)
      .withColumn("series_hash", xxhash64(keepLbls.map(col): _*))
  }
}
