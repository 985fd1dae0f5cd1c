package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star operator): treat image/audio/video
  * as opaque `binary` columns with typed metadata, and run batch decoders as
  * partition-wise functions — the Scala analog of `mapInPandas` (a typed
  * `mapPartitions` over case-class rows: one iterator in, one iterator out,
  * arbitrary per-batch state such as a decoder handle).
  *
  * The decode itself is a STUB — no image/audio codec ships in this
  * environment — producing deterministic byte-level "features", but the
  * Spark-side shape is real: schema, encoders, partition-wise batching, and
  * the output contract a real decoder (JNI/FFI image lib) would slot into.
  * At 100 TB the pattern holds: decoders are per-partition (amortized init),
  * the binary column never shuffles (features are extracted before any
  * aggregation), and partition sizing is controlled by
  * `spark.sql.files.maxPartitionBytes`.
  */
object Multimodal {

  /** Input row: opaque media bytes + typed metadata. */
  final case class MediaRow(doc_id: Long, media_type: String, img_bytes: Array[Byte])

  /** Output row: fixed-width feature vector + decode metadata. */
  final case class MediaFeatures(doc_id: Long, media_type: String, byte_len: Int,
                                 width: Int, height: Int, features: Array[Double])

  /** Stage the documents fixture as a media table (text bytes standing in for
    * encoded media). */
  def mediaTable(df: DataFrame): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), lit("image/fake").as("media_type"),
        encode(col("text"), "UTF-8").as("img_bytes"))
      .as[MediaRow]
  }

  /** STUB decoder: deterministic features from the raw bytes (byte histogram
    * moments). A real implementation would initialize a codec once per
    * partition (the `it =>` closure runs once per partition) and decode each
    * record — exactly where e.g. a JNI image library call would go. */
  def decodeBatch(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition init happens here (decoder handle, buffers, …)
      it.map { m =>
        val n = m.img_bytes.length
        var s0 = 0L; var s1 = 0L; var i = 0
        while (i < n) { val b = m.img_bytes(i) & 0xff; s0 += b; s1 += b.toLong * b; i += 1 }
        val mean = if (n == 0) 0.0 else s0.toDouble / n
        val mom2 = if (n == 0) 0.0 else s1.toDouble / n
        MediaFeatures(m.doc_id, m.media_type, n,
          width = 1 + n % 640, height = 1 + (n * 7) % 480,
          features = Array(n.toDouble, mean, mom2, mom2 - mean * mean))
      }
    }
  }

  /** End-to-end: documents → media table → batch decode → features table. */
  def featuresOf(spark: SparkSession, documents: DataFrame): DataFrame =
    decodeBatch(mediaTable(documents)).toDF()
}
