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

  /** REAL header decode: format + pixel geometry straight from the
    * container headers — PNG IHDR, JPEG SOFn marker scan, GIF logical
    * screen descriptor, WebP VP8/VP8L/VP8X — the same magic signatures
    * `Mime.sniff` keys on. None for bytes that are not a known image
    * container (full pixel decode of arbitrary codecs would need an
    * imaging library; header geometry is what crawl metadata needs). */
  def decodeHeader(b: Array[Byte]): Option[(String, Int, Int)] = {
    def u8(i: Int) = b(i) & 0xff
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int) = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le24(i: Int) = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)
    if (b == null) return None
    // PNG: 8-byte signature, IHDR chunk first — width/height BE at 16/20
    if (b.length >= 24 && u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' && u8(3) == 'G')
      return Some(("png", be32(16), be32(20)))
    // JPEG: FF D8, then scan segments for a SOFn (C0..CF minus C4/C8/CC)
    if (b.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      var i = 2
      while (i + 9 < b.length && u8(i) == 0xff) {
        val m = u8(i + 1)
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc)
          return Some(("jpeg", be16(i + 7), be16(i + 5)))
        i += (if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) 2
              else 2 + be16(i + 2))
      }
      return Some(("jpeg", 0, 0)) // JPEG magic but no SOF in the prefix
    }
    // GIF: full 6-byte signature GIF87a/GIF89a (the 3-byte prefix alone
    // would false-fire on plain text starting with "GIF"), then the
    // logical screen descriptor, LE at 6/8
    if (b.length >= 10 && u8(0) == 'G' && u8(1) == 'I' && u8(2) == 'F' &&
        u8(3) == '8' && (u8(4) == '7' || u8(4) == '9') && u8(5) == 'a')
      return Some(("gif", le16(6), le16(8)))
    // WebP: RIFF....WEBP + VP8 /VP8L/VP8X chunk
    if (b.length >= 30 && u8(0) == 'R' && u8(1) == 'I' && u8(2) == 'F' && u8(3) == 'F' &&
      u8(8) == 'W' && u8(9) == 'E' && u8(10) == 'B' && u8(11) == 'P') {
      val chunk = new String(b, 12, 4, java.nio.charset.StandardCharsets.US_ASCII)
      chunk match {
        case "VP8 " => return Some(("webp", le16(26) & 0x3fff, le16(28) & 0x3fff))
        case "VP8L" =>
          val bits = le32(b, 21)
          return Some(("webp", 1 + (bits & 0x3fff), 1 + ((bits >> 14) & 0x3fff)))
        case "VP8X" => return Some(("webp", 1 + le24(24), 1 + le24(27)))
        case _ => return Some(("webp", 0, 0))
      }
    }
    None
  }

  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  /** Decode kernel: REAL header geometry when the bytes are a known image
    * container; otherwise the deterministic fake (pure function of the
    * bytes — fixture blobs are text and keep their mirrorable oracle). */
  private def decodeOne(docId: Long, blob: Array[Byte],
                        sniffHeaders: Boolean): MediaMeta = {
    var sum = 0L
    var i = 0
    while (i < blob.length) { sum = sum * 31 + (blob(i) & 0xff); i += 1 }
    (if (sniffHeaders) decodeHeader(blob) else None) match {
      case Some((fmt, w, h)) => MediaMeta(docId, blob.length, fmt, w, h, sum)
      case None =>
        // deterministic fake: geometry from byte statistics (non-image bytes)
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
  }

  /** Batch decode: partition-local, no shuffle, typed output. The batch
    * shape (iterator-of-rows per partition) is what a vectorized decoder
    * needs; swap `decodeOne` for the real kernel. */
  def decodeBlobs(blobs: DataFrame, sniffHeaders: Boolean = true): Dataset[MediaMeta] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) => decodeOne(id, b, sniffHeaders) })
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
