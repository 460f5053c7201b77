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

  /** Content-magic sniff (the highest-precedence resolution rung — the
    * reference resolves from content bytes via Tika magic in
    * util/MimeUtil.java autoResolveContentType; this is the same intent as
    * a small static table). Returns a CONFIDENT mime from the leading
    * bytes, else null: strong binary signatures first, then the
    * unambiguous text openings (XML prolog, HTML doctype/root tags).
    * Pure + static so it can run inside task closures and codegen. */
  def sniff(content: Array[Byte]): String = {
    if (content == null || content.length < 4) return null
    @inline def at(i: Int): Int = content(i) & 0xff
    def ascii(prefix: String, from: Int = 0): Boolean = {
      if (content.length < from + prefix.length) return false
      var i = 0
      while (i < prefix.length) {
        if ((content(from + i) & 0xff) != prefix.charAt(i)) return false
        i += 1
      }
      true
    }
    if (at(0) == 0x89 && ascii("PNG", 1)) return "image/png"
    if (at(0) == 0xff && at(1) == 0xd8 && at(2) == 0xff) return "image/jpeg"
    if (ascii("GIF87a") || ascii("GIF89a")) return "image/gif"
    if (at(0) == 0x1f && at(1) == 0x8b) return "application/gzip"
    if (ascii("%PDF")) return "application/pdf"
    if (ascii("PK") && at(2) == 3 && at(3) == 4) return "application/zip"
    if (ascii("RIFF") && content.length >= 12 && ascii("WEBP", 8)) return "image/webp"
    if (ascii("WARC/")) return "application/warc"
    if (ascii("OggS")) return "audio/ogg"
    if (ascii("ID3")) return "audio/mpeg"
    // a bare MPEG frame-sync word (FF Ex) is NOT sniffed: it collides with
    // the UTF-16LE BOM (FF FE) and random binary — too weak for a rung
    // that overrides an explicit header. UTF-16 text is likewise left to
    // the header (content sniffing here is byte-oriented).
    if ((at(0) == 0xff && at(1) == 0xfe) || (at(0) == 0xfe && at(1) == 0xff)) return null
    // text sniff: skip UTF-8 BOM + leading whitespace, lowercase a short
    // window, accept only the unambiguous openings
    var i = if (at(0) == 0xef && at(1) == 0xbb && at(2) == 0xbf) 3 else 0
    val end = math.min(content.length, i + 256)
    while (i < end && (content(i) == ' ' || content(i) == '\t' ||
      content(i) == '\r' || content(i) == '\n')) i += 1
    val window = new String(content, i, math.min(256, content.length - i),
      java.nio.charset.StandardCharsets.ISO_8859_1).toLowerCase(Locale.ROOT)
    if (window.startsWith("<?xml")) {
      // XML prolog alone is ambiguous: XHTML and SVG open with it too, and
      // demoting them to the generic XML parser would drop their outlinks
      if (window.contains("<html") || window.contains("doctype html"))
        return "application/xhtml+xml"
      if (window.contains("<svg")) return "image/svg+xml"
      return "application/xml"
    }
    if (window.startsWith("<!doctype html") || window.startsWith("<html") ||
        window.startsWith("<head") || window.startsWith("<body")) return "text/html"
    null
  }

  /** Full resolution with content in hand (the fetch/parse dispatch path):
    * content magic WINS over a lying Content-Type header; header, extension
    * and the text/html default follow in the usual order. A PDF served as
    * text/html dispatches as a PDF; HTML served as text/plain parses as
    * HTML — MimeUtil.autoResolveContentType's behavior. */
  def resolveWithContent(contentType: String, url: String, content: Array[Byte]): String = {
    val sniffed = sniff(content)
    if (sniffed != null) sniffed else resolve(contentType, url)
  }
}
