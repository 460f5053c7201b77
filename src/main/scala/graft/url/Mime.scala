package graft.url

import java.util.Locale

/** Content-type resolution (the reference's MimeUtil over Tika: normalize
  * the protocol's Content-Type header, fall back to the URL extension when
  * the header is missing/opaque — util/MimeUtil.java autoResolveContentType
  * semantics, table-driven instead of Tika-driven).
  *
  * Pure + static so it can run inside codegen'd Catalyst expressions.
  */
object Mime {

  private val ByExtension: Map[String, String] = Map(
    "html" -> "text/html", "htm" -> "text/html", "xhtml" -> "application/xhtml+xml",
    "txt" -> "text/plain", "text" -> "text/plain", "md" -> "text/plain",
    "xml" -> "application/xml", "rss" -> "application/rss+xml", "atom" -> "application/atom+xml",
    "json" -> "application/json", "js" -> "application/javascript", "css" -> "text/css",
    "pdf" -> "application/pdf", "ps" -> "application/postscript",
    "doc" -> "application/msword", "docx" -> "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
    "xls" -> "application/vnd.ms-excel", "xlsx" -> "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
    "ppt" -> "application/vnd.ms-powerpoint", "pptx" -> "application/vnd.openxmlformats-officedocument.presentationml.presentation",
    "rtf" -> "application/rtf", "csv" -> "text/csv",
    "gif" -> "image/gif", "jpg" -> "image/jpeg", "jpeg" -> "image/jpeg",
    "png" -> "image/png", "webp" -> "image/webp", "svg" -> "image/svg+xml",
    "ico" -> "image/vnd.microsoft.icon", "bmp" -> "image/bmp", "tif" -> "image/tiff", "tiff" -> "image/tiff",
    "mp3" -> "audio/mpeg", "wav" -> "audio/wav", "ogg" -> "audio/ogg", "flac" -> "audio/flac",
    "mp4" -> "video/mp4", "mpg" -> "video/mpeg", "mpeg" -> "video/mpeg",
    "avi" -> "video/x-msvideo", "mov" -> "video/quicktime", "webm" -> "video/webm", "mkv" -> "video/x-matroska",
    "zip" -> "application/zip", "gz" -> "application/gzip", "tgz" -> "application/gzip",
    "tar" -> "application/x-tar", "bz2" -> "application/x-bzip2", "7z" -> "application/x-7z-compressed",
    "rar" -> "application/vnd.rar", "exe" -> "application/x-msdownload",
    "woff" -> "font/woff", "woff2" -> "font/woff2", "ttf" -> "font/ttf",
    "warc" -> "application/warc", "arc" -> "application/octet-stream")

  /** Normalize a raw Content-Type header: lowercase, strip parameters
    * (charset etc.), trim; null/blank/unknown-ish → null. */
  def normalize(contentType: String): String = {
    if (contentType == null) return null
    val semi = contentType.indexOf(';')
    val base = (if (semi >= 0) contentType.substring(0, semi) else contentType)
      .trim.toLowerCase(Locale.ROOT)
    if (base.isEmpty || base == "application/octet-stream" || !base.contains('/')) null
    else base
  }

  /** Mime from the URL's path extension; null if unknown. */
  def fromUrl(url: String): String = {
    if (url == null) return null
    val path = Urls.pathQueryOf(url)
    val q = path.indexOf('?')
    val p = if (q >= 0) path.substring(0, q) else path
    val dot = p.lastIndexOf('.')
    val slash = p.lastIndexOf('/')
    if (dot <= slash) return null
    ByExtension.getOrElse(p.substring(dot + 1).toLowerCase(Locale.ROOT), null)
  }

  /** Resolve: normalized header if usable, else by extension, else
    * text/html (the crawl's dominant default, like the reference's
    * sniffing fallback for web pages). */
  def resolve(contentType: String, url: String): String = {
    val n = normalize(contentType)
    if (n != null) n
    else {
      val u = fromUrl(url)
      if (u != null) u else "text/html"
    }
  }
}
