package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: image/audio/video
  * travel as opaque `binary` payloads with typed metadata; decode /
  * feature-extract / frame-sample run as partition-local batch functions.
  *
  * The actual codecs (JPEG/PNG/audio) are NOT present in this container, so
  * [[FakeDecoder]] below is a clearly-marked deterministic STUB — the
  * Spark-side contract (schema, partitioning, batch iteration shape, typed
  * output) is real and tested, and a production deployment swaps the stub
  * for a real codec without touching the plumbing.
  *
  * Scale notes: decode runs via `mapPartitions` (one decoder instance per
  * partition, amortized setup — the Scala analogue of `mapInPandas` batch
  * UDFs); payloads never pass through the driver; metadata-only queries
  * (size, hash, mime) prune the payload column from the parquet scan.
  */
object Multimodal {

  /** One media row: opaque payload + typed metadata. */
  case class MediaRecord(media_id: Long, mime: String, payload: Array[Byte])

  /** Decoded feature row (what a real image decoder would emit: dimensions
    * + an embedding-like feature vector). */
  case class MediaFeatures(media_id: Long, mime: String, n_bytes: Int,
                           width: Int, height: Int, features: Array[Float])

  /** Decoder contract: batch-in, batch-out over one partition's records. */
  trait Decoder extends Serializable {
    def decode(records: Iterator[MediaRecord]): Iterator[MediaFeatures]
  }

  /** STUB decoder — deterministic fake standing in for a real codec.
    * "Width/height" derive from payload length; "features" are a fixed-size
    * byte histogram-ish projection. Replace with a real decoder in prod. */
  class FakeDecoder(featureDim: Int = 8) extends Decoder {
    def decode(records: Iterator[MediaRecord]): Iterator[MediaFeatures] =
      records.map { r =>
        val n = r.payload.length
        val side = math.max(1, math.sqrt(n.toDouble).toInt)
        val feats = new Array[Float](featureDim)
        var i = 0
        while (i < n) { feats(i % featureDim) += (r.payload(i) & 0xff) / 255.0f; i += 1 }
        MediaFeatures(r.media_id, r.mime, n, side, math.max(1, n / side), feats)
      }
  }

  /** Build a media table from any (id, string-payload) source — here the
    * documents table stands in for a binary blob store. */
  def toMediaTable(df: DataFrame, idCol: String, payloadCol: String,
                   mime: String = "application/octet-stream"): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(mime).as("mime"),
      col(payloadCol).cast("binary").as("payload"))

  /** Partition-local decode: the mapPartitions shape a real codec needs
    * (per-partition setup, streaming batch iteration, no driver transit). */
  def decodeFeatures(spark: SparkSession, media: DataFrame,
                     decoder: Decoder = new FakeDecoder()): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(decoder.decode(_))
  }

  /** Frame sampling: every `stride`-th fixed-size byte window of the payload
    * — the binary-slicing primitive video pipelines need, as a pure column
    * expression (substr on binary is codegen'd). */
  def sampleFrames(payload: org.apache.spark.sql.Column,
                   frameSize: Int, stride: Int): org.apache.spark.sql.Column =
    transform(
      sequence(lit(1), greatest(
        floor((octet_length(payload) - frameSize) / stride).cast("int") + 1, lit(0))),
      i => call_function("substr", payload, (i - 1) * stride + 1, lit(frameSize)))

  /** Metadata-only projection — never touches payload bytes beyond length +
    * hash; the parquet scan prunes to the needed columns. */
  def metadata(media: DataFrame): DataFrame =
    media.select(
      col("media_id"), col("mime"),
      octet_length(col("payload")).as("n_bytes"),
      md5(col("payload")).as("payload_md5"))
}
