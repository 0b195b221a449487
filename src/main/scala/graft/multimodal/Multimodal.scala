package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns + typed
  * metadata, with decode / feature-extract as partition-local typed
  * transformations.
  *
  * The Spark-side mechanics are real and tested — schema, encoders,
  * partition-preserving execution (no shuffle: `mapPartitions` over the
  * typed Dataset keeps each batch on its executor, which is exactly how a
  * Pandas-UDF/`mapInPandas` decode stage behaves on a cluster). The actual
  * media decode is a STUB (no image/audio libs in this container): a
  * deterministic fake that derives "decoded" properties from the bytes.
  * Swap [[decodeStub]] for a real codec (JavaCV / TwelveMonkeys / ffmpeg
  * via Process) without touching the plumbing.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class MediaMeta(
      doc_id: Long,
      byte_len: Long,
      format: String,
      width: Int,
      height: Int,
      checksum: Long)

  /** STUB decode: deterministic fake media properties from raw bytes.
    * Replace with a real decoder; the signature (bytes → typed meta) and the
    * partition-local batch execution are the production shape.
    */
  def decodeStub(id: Long, bytes: Array[Byte]): MediaMeta = {
    val len = bytes.length.toLong
    val head = if (bytes.nonEmpty) bytes(0) & 0xff else 0
    var ck = 1125899906842597L
    var i = 0
    while (i < bytes.length) { ck = 31 * ck + bytes(i); i += 1 }
    MediaMeta(
      doc_id = id,
      byte_len = len,
      format = if (head % 2 == 0) "fake/png" else "fake/jpeg",
      width = 16 + (head % 64),
      height = 16 + ((len % 64)).toInt,
      checksum = ck)
  }

  /** documents → opaque binary payload column (UTF-8 bytes stand in for
    * media bytes; at 100 TB this column is the large blob you NEVER shuffle
    * — all decode/feature stages below are partition-local).
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      // null text → empty payload: the decode stage must never NPE on a
      // legal nullable column
      encode(coalesce(col("text"), lit("")), "UTF-8").as("payload"))

  /** Partition-local decode: binary payload → typed metadata. */
  def decodeMeta(media: DataFrame): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions(_.map(r => decodeStub(r.doc_id, r.payload)))
  }

  /** Frame-sample stub: deterministic every-nth-byte "frames" from a payload,
    * the plumbing shape of video frame extraction (one row in → N rows out,
    * still partition-local via flatMap).
    */
  def sampleFrames(media: DataFrame, everyN: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRow]
      .flatMap { r =>
        r.payload.indices.by(everyN).map { off =>
          (r.doc_id, off, r.payload(off).toInt & 0xff)
        }
      }
      .toDF("doc_id", "frame_offset", "frame_byte")
  }
}
