package graft.index

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.fetch.FetchedPage
import graft.frontier.CrawlConfig
import graft.schema.CrawlStatus
import graft.url.{UrlFilters, Urls}

/** Legacy ARC ingestion (the reference's tools.arc surface:
  * ArcRecordReader splits the container into `header-line + payload`
  * records, ArcSegmentCreator maps each to a successful fetch —
  * reference/src/java/org/apache/nutch/tools/arc/ArcRecordReader.java:195-280,
  * ArcSegmentCreator.java:274-340).
  *
  * ARC v1 URL-record header: `url ip-address archive-date content-type
  * length` (whitespace-separated); the container opens with a
  * `filedesc://` version record, which is skipped like the reference does.
  * Records are parsed partition-local from container text and re-enter the
  * engine as FETCH_SUCCESS pages through the mime-dispatched DocParser
  * registry (so an archived HTML page yields the same interleaved spans a
  * live fetch would), after the same normalize + filter discipline.
  */
object ArcImport {

  final case class ArcRecord(url: String, ip: String, archiveDateMs: Long,
                             mime: String, payload: Array[Byte])

  private val ArcDate = java.time.format.DateTimeFormatter
    .ofPattern("yyyyMMddHHmmss").withZone(java.time.ZoneOffset.UTC)

  /** Parse one ARC container's text into its records. Forgiving: malformed
    * headers or truncated payloads end the scan; `filedesc://` version
    * records are skipped. NOTE: the ARC length field counts BYTES; this
    * text-level parser slices characters, which is exact for single-byte
    * content (the dominant archived-web case) — multi-byte payloads shift
    * the frame and the forgiving scan stops at the first misaligned header
    * instead of emitting garbage. Byte-exact framing would read containers
    * as binary before decoding per-record. */
  def parseArc(container: String): Seq[ArcRecord] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[ArcRecord]
    var i = 0
    val n = container.length
    while (i < n) {
      // skip blank separator lines
      while (i < n && (container.charAt(i) == '\n' || container.charAt(i) == '\r')) i += 1
      if (i < n) {
        val eol = container.indexOf('\n', i)
        if (eol < 0) return out.toSeq
        val header = container.substring(i, eol).trim
        val parts = header.split("\\s+")
        if (parts.length < 5) return out.toSeq // malformed header: stop
        val len = parts(parts.length - 1).toIntOption.getOrElse(return out.toSeq)
        val start = eol + 1
        if (start + len > n) return out.toSeq // truncated payload: stop
        val payload = container.substring(start, start + len)
        if (!parts(0).startsWith("filedesc://")) {
          val dateMs =
            try java.time.Instant.from(ArcDate.parse(parts(2))).toEpochMilli
            catch { case _: Exception => 0L }
          out += ArcRecord(parts(0), parts(1), dateMs, parts(3),
            payload.getBytes(StandardCharsets.UTF_8))
        }
        i = start + len
      }
    }
    out.toSeq
  }

  /** ARC containers (one string each) → the engine's fetched-page rows:
    * normalize + filter the URL, dispatch the payload through the mime
    * registry for spans, sign the content — every row a FETCH_SUCCESS at
    * the record's archive date (ArcSegmentCreator's fixed success
    * semantics). Partition-local; no shuffle. */
  def toFetched(containers: Dataset[String], cfg: CrawlConfig, round: Int): Dataset[FetchedPage] = {
    val spark = containers.sparkSession
    import spark.implicits._
    val signer: graft.frontier.Signer =
      if (cfg.signer == "md5") graft.frontier.Md5Signer else graft.frontier.TextProfileSigner()
    containers.flatMap { text =>
      parseArc(text).iterator.flatMap { r =>
        val url = UrlFilters.canonicalizeAndFilter(r.url)
        if (url == null) Iterator.empty
        else {
          val spans = graft.parse.DocParsers.parseSpans(r.mime, url, r.payload, cfg)
          val host = Urls.hostOf(url)
          Iterator(FetchedPage(url, Urls.hash64(url), host, CrawlStatus.FETCH_SUCCESS,
            "SUCCESS", r.archiveDateMs, r.mime, signer.signSpans(spans), null,
            0, cfg.fetchIntervalDefault, 1.0f, round, spans))
        }
      }
    }
  }
}
