package graft.analysis

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.{functions => F}

/** Extracted metadata for one media blob. All fields are deterministic
  * functions of the payload so tests and oracles can replay them. */
final case class MediaMeta(
    doc_id: Long,
    n_bytes: Long,
    width: Long,
    height: Long,
    n_frames: Long)

/** Multimodal-column plumbing: opaque `binary` payloads (image/audio/
  * video) processed per-partition in batches.
  *
  * The real decode (libjpeg/ffmpeg et al.) is NOT available in this
  * container, so [[decodeStub]] is a clearly-marked deterministic fake:
  * it derives plausible metadata from the byte payload by arithmetic.
  * Everything AROUND it is the real production shape:
  *  - binary column stays opaque to Catalyst (no accidental UTF-8 decode),
  *  - work happens inside `mapPartitions` so a native decoder could hold
  *    per-partition state (codec contexts, pinned buffers) and process
  *    rows in batches,
  *  - output is a typed Dataset with a fixed metadata schema, joinable
  *    back to the source by doc_id.
  * Swapping the stub for a real decoder changes ONE function.
  */
object Multimodal {

  /** STUB — deterministic fake decode. Replace with a real decoder at
    * deploy time; the signature (bytes in, metadata out) is the contract. */
  def decodeStub(id: Long, bytes: Array[Byte]): MediaMeta = {
    val n = if (bytes == null) 0L else bytes.length.toLong
    MediaMeta(
      doc_id = id,
      n_bytes = n,
      width = 320L + n % 1280L,
      height = 240L + n % 720L,
      n_frames = 1L + n % 24L)
  }

  /** Per-partition batched "decode" of (id, payload) rows. */
  def extractMeta(media: DataFrame, idCol: String = "doc_id",
                  payloadCol: String = "payload"): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(F.col(idCol).cast("long"), F.col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // batch loop: a real decoder would init its context once here
        it.map { case (id, bytes) => decodeStub(id, bytes) }
      }
  }

  /** Frame sampling: chunk the opaque payload into fixed-size frames —
    * one output row per frame, real byte slicing (a video frame-sampler
    * swaps the slice for a demuxer call; the explode shape, schema and
    * partition-batching stay). Output: (doc_id, frame_idx, frame_len,
    * frame) where frame is the actual byte slice. */
  def sampleFrames(media: DataFrame, frameBytes: Int,
                   idCol: String = "doc_id",
                   payloadCol: String = "payload"): DataFrame = {
    require(frameBytes > 0)
    val spark = media.sparkSession
    import spark.implicits._
    media.select(F.col(idCol).cast("long"), F.col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val payload = if (bytes == null) Array.emptyByteArray else bytes
          val nFrames = (payload.length + frameBytes - 1) / frameBytes
          (0 until nFrames).iterator.map { i =>
            val from = i * frameBytes
            val until = math.min(payload.length, from + frameBytes)
            (id, i.toLong, (until - from).toLong,
              java.util.Arrays.copyOfRange(payload, from, until))
          }
        }
      }
      .toDF(idCol, "frame_idx", "frame_len", "frame")
  }
}
