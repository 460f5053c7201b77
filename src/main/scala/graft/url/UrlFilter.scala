package graft.url

import java.util.Locale

/** URL accept/deny filtering.
  *
  * Semantics derived from the reference's default filter rules
  * (reference/conf/regex-urlfilter.txt.template, engine
  * reference/src/plugin/urlfilter-regex/.../RegexURLFilter.java:113):
  * drop non-web schemes, media/binary suffixes, path loops, over-long URLs;
  * accept the rest. Implemented as an ordered chain of pure predicates
  * (trait UrlFilter) compiled into one accept() function usable from a
  * Catalyst StaticInvoke (no per-row regex compilation).
  */
trait UrlFilter extends Serializable {
  /** true = pass, false = drop. */
  def accept(url: String): Boolean
}

object UrlFilters {

  /** Media/binary suffixes dropped by the default rules. */
  private val DeniedSuffixes = Set(
    "gif", "jpg", "jpeg", "png", "ico", "css", "sit", "eps", "wmf", "zip",
    "ppt", "mpg", "xls", "gz", "rpm", "tgz", "mov", "exe", "jpeg", "bmp",
    "js", "mp3", "mp4", "wav", "avi", "svg", "webp", "woff", "ttf", "pdf")

  final val MaxUrlLength = 4096

  /** The default filter chain, fused into one static function. */
  def accept(url: String): Boolean = {
    if (url == null) return false
    if (url.length > MaxUrlLength) return false
    val lower = url.toLowerCase(Locale.ROOT)
    // scheme allow-list (reference denies file:/ftp:/mailto:)
    if (!(lower.startsWith("http://") || lower.startsWith("https://"))) return false
    // media suffix deny
    val qIdx = lower.indexOf('?')
    val path = if (qIdx < 0) lower else lower.substring(0, qIdx)
    val dot = path.lastIndexOf('.')
    val slash = path.lastIndexOf('/')
    if (dot > slash && dot >= 0) {
      val suffix = path.substring(dot + 1)
      if (DeniedSuffixes.contains(suffix)) return false
    }
    // path-loop repeats (3+ identical consecutive segments ⇒ crawler trap)
    if (hasSegmentLoop(path)) return false
    true
  }

  private def hasSegmentLoop(path: String): Boolean = {
    val segs = path.split('/')
    var run = 1
    var i = 1
    while (i < segs.length) {
      if (segs(i).nonEmpty && segs(i) == segs(i - 1)) {
        run += 1
        if (run >= 3) return true
      } else run = 1
      i += 1
    }
    false
  }

  /** Combined per-URL pipeline used on discovered outlinks:
    * canonicalize then filter; null = dropped. */
  def canonicalizeAndFilter(raw: String): String = {
    val c = Urls.canonicalize(raw)
    if (c != null && accept(c)) c else null
  }
}
