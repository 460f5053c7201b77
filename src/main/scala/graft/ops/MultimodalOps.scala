package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque binary columns with typed
  * metadata, batch-decoded per partition.
  *
  * No image/audio libraries ship in this container, so the decode kernel is
  * a DETERMINISTIC FAKE (clearly marked below): it derives width/height/
  * format from the blob bytes. Everything around it — the binary column
  * schema, the partition-local batch shape, the typed output — is the real
  * Spark plumbing a production decoder would drop into.
  */
object MultimodalOps {

  case class MediaMeta(doc_id: Long, n_bytes: Int, format: String,
                       width: Int, height: Int, checksum: Long)

  /** Attach a binary media blob to each document (fake media: the utf-8
    * bytes of the text stand in for image bytes). */
  def attachBlobs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("blob"))

  /** FAKE DECODE KERNEL — stands in for an image decoder. Deterministic,
    * pure function of the bytes; replace with a real codec binding at the
    * marked line. */
  private def decodeOne(docId: Long, blob: Array[Byte]): MediaMeta = {
    // ??? real decoder goes here (e.g. javax.imageio / ffmpeg binding).
    // Deterministic fake: geometry from byte statistics.
    var sum = 0L
    var i = 0
    while (i < blob.length) { sum = sum * 31 + (blob(i) & 0xff); i += 1 }
    val fmt = (sum % 3).toInt match {
      case 0 => "png"
      case 1 => "jpeg"
      case _ => "webp"
    }
    MediaMeta(docId, blob.length, fmt,
      width = 64 + math.floorMod(sum, 576L).toInt,
      height = 64 + math.floorMod(sum >> 16, 416L).toInt,
      checksum = sum)
  }

  /** Batch decode: partition-local, no shuffle, typed output. The batch
    * shape (iterator-of-rows per partition) is what a vectorized decoder
    * needs; swap `decodeOne` for the real kernel. */
  def decodeBlobs(blobs: DataFrame): Dataset[MediaMeta] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) => decodeOne(id, b) })
  }

  /** Oracle-mirrorable metadata projection (pure SQL arithmetic over the
    * blob/text — validates the binary-column plumbing end-to-end). */
  def mediaMeta(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      length(col("text").cast("binary")).as("n_bytes"),
      ascii(substring(col("text"), 1, 1)).as("first_byte"),
      (length(col("text").cast("binary")) % 640).as("fake_width"),
      (length(col("text").cast("binary")) * 7 % 480).as("fake_height")
    )
}
