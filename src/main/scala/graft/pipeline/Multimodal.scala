package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / resize /
  * frame-sample operators.
  *
  * The decode step itself is STUBBED (this container ships no image/audio
  * codecs): [[MediaDecoder.Stub]] produces deterministic fake features from
  * the bytes. Everything Spark-side is real and tested — the binary schema,
  * the partition-iterator batch shape (decoder initialized once per
  * partition, amortized over its rows, exactly how a JNI/codec handle would
  * be), and the feature schema. Swapping in a real codec changes only the
  * `MediaDecoder` implementation.
  *
  * Scale: decode is a narrow mapPartitions — no shuffle; bytes never leave
  * their partition. Feature extraction should run *after* any dedup (cheap
  * filter first) and project away the bytes as early as possible.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRecord(
      media_id: Long,
      media_type: String, // "image" | "audio" | "video"
      bytes: Array[Byte],
      source: String)

  /** Extracted features (schema is the contract; values come from the
    * decoder implementation). */
  final case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Int,
      width: Int,
      height: Int,
      duration_ms: Long,
      digest: String)

  /** One sampled frame of a video payload. */
  final case class Frame(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** Decoder boundary: one instance per partition (models an expensive
    * codec/JNI handle initialized once and reused across the batch). */
  trait MediaDecoder extends Serializable {
    def decode(r: MediaRecord): MediaFeatures
  }

  object MediaDecoder {
    /** Deterministic stand-in for the real codec: features derived from the
      * byte payload only, so tests and oracles reproduce them. */
    object Stub extends MediaDecoder {
      def decode(r: MediaRecord): MediaFeatures = {
        val n = r.bytes.length
        MediaFeatures(
          media_id = r.media_id,
          media_type = r.media_type,
          n_bytes = n,
          width = if (r.media_type == "audio") 0 else 16 + n % 1024,
          height = if (r.media_type == "audio") 0 else 16 + (n / 2) % 1024,
          duration_ms = if (r.media_type == "image") 0L else n.toLong * 10L,
          digest = java.security.MessageDigest.getInstance("MD5")
            .digest(r.bytes).map("%02x".format(_)).mkString)
      }
    }
  }

  /** Synthesize a media table from the documents table (test substrate:
    * text bytes as payload, type derived from the id). */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("bytes"),
      col("source"))

  /** Batch feature extraction: decoder constructed once per partition,
    * applied across the partition's rows (the Scala analog of a
    * batch-shaped decode UDF). */
  def extractFeatures(media: Dataset[MediaRecord],
      decoder: MediaDecoder = MediaDecoder.Stub)(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      val d = decoder // per-partition init point for real codecs
      it.map(d.decode)
    }
  }

  /** Deterministic frame sampling for video payloads: every `everyN`-th
    * 256-byte slice becomes a "frame" (plumbing-real, decode-stubbed). */
  def sampleFrames(media: Dataset[MediaRecord], everyN: Int)(
      implicit spark: SparkSession): Dataset[Frame] = {
    import spark.implicits._
    media.filter(_.media_type == "video").flatMap { r =>
      val frames = r.bytes.grouped(256).toSeq
      frames.zipWithIndex.collect {
        case (bs, i) if i % everyN == 0 => Frame(r.media_id, i, bs)
      }
    }
  }

  /** "Resize": truncate payloads to `maxBytes` (a stand-in with the real
    * operator's cost shape — narrow, bytes-local). */
  def resize(media: Dataset[MediaRecord], maxBytes: Int)(
      implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    media.map(r => if (r.bytes.length <= maxBytes) r
      else r.copy(bytes = r.bytes.take(maxBytes)))
  }
}
