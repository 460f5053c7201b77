package graft.parse

import java.nio.{ByteBuffer, CharBuffer}
import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}
import java.util.Locale

/** Per-page character-encoding resolution — the reference's
  * util/EncodingDetector.java + parse-html HtmlParser.sniffCharacterEncoding
  * (reference/src/java/org/apache/nutch/util/EncodingDetector.java:296-345,
  * src/plugin/parse-html/.../HtmlParser.java:96-135), re-derived without the
  * ICU detector. Decoding everything as UTF-8 would mojibake
  * Latin-1/Shift_JIS/GBK pages — silently corrupting parse text,
  * TextProfile signatures, and therefore dedup.
  *
  * Clue order (the reference's clue list with the default
  * `encodingdetector.charset.min.confidence = -1`, i.e. no ICU clues):
  *   1. Content-Type header `charset=` parameter
  *      (EncodingDetector.parseCharacterEncoding — catalina-style parse);
  *   2. content sniff over the first 8192 bytes, ASCII-inflated exactly like
  *      the reference: `<meta http-equiv=content-type>` charset, HTML5
  *      `<meta charset=...>`, XML-prolog `encoding=`, then BOM;
  *   3. strict-UTF-8 validation of the full body (incomplete FINAL sequence
  *      tolerated — truncation at http.content.limit can cut mid-char);
  *   4. the configured default (reference parser.character.encoding.default,
  *      windows-1252).
  *
  * Mislabel corrections ride along (EncodingDetector ALIASES:120-148): the
  * web labels windows-1252 content "ISO-8859-1" so pervasively that the
  * superset is the correct decode.
  */
object Charsets {

  /** EncodingDetector.ALIASES — mislabelled-in-the-wild corrections. */
  private val Corrections = Map(
    "ISO-8859-1" -> "windows-1252",
    "EUC-KR" -> "x-windows-949",
    "x-EUC-CN" -> "GB18030",
    "GBK" -> "GB18030")

  private val ChunkSize = 8192 // HtmlParser.CHUNK_SIZE

  // HtmlParser.metaPattern / charsetPattern / charsetPatternHTML5 + XML prolog
  private val MetaRe =
    "(?is)<meta\\s+([^>]*http-equiv\\s*=\\s*[\"']?content-type[\"']?[^>]*)>".r
  private val CharsetRe = "(?i)charset\\s*=\\s*[\"']?([a-z][_\\-0-9a-z]*)".r
  private val Html5Re = "(?is)<meta\\s+charset\\s*=\\s*[\"']?([a-z][_\\-0-9a-z]*)".r
  private val XmlRe = "(?i)<\\?xml[^>]*encoding\\s*=\\s*[\"']([A-Za-z0-9._\\-]+)[\"']".r

  /** `charset=` value of a Content-Type header, or null (reference
    * EncodingDetector.parseCharacterEncoding). */
  def fromContentType(contentType: String): String = {
    if (contentType == null) return null
    val lower = contentType.toLowerCase(Locale.ROOT)
    val start = lower.indexOf("charset=")
    if (start < 0) return null
    var enc = contentType.substring(start + 8)
    val end = enc.indexOf(';')
    if (end >= 0) enc = enc.substring(0, end)
    enc = enc.trim
    if (enc.length > 2 && enc.startsWith("\"") && enc.endsWith("\""))
      enc = enc.substring(1, enc.length - 1).trim
    if (enc.isEmpty) null else enc
  }

  /** Canonical JVM charset for a (possibly aliased/mislabelled) name, with
    * the EncodingDetector corrections applied; None for unknown names. */
  def resolve(name: String): Option[Charset] = {
    if (name == null) return None
    try {
      if (!Charset.isSupported(name)) return None
      val canonical = Charset.forName(name).name()
      Some(Charset.forName(Corrections.getOrElse(canonical, canonical)))
    } catch { case _: Exception => None }
  }

  /** Meta/prolog/BOM sniff over the first 8192 bytes (the reference's
    * ASCII-inflation trick: each byte zero-padded to a char, so the regexes
    * run on any ASCII-superset encoding). Returns the declared NAME. */
  def sniff(content: Array[Byte]): String = {
    if (content == null || content.isEmpty) return null
    val len = math.min(content.length, ChunkSize)
    val str = new String(content, 0, len, StandardCharsets.US_ASCII)
    val meta = MetaRe.findFirstMatchIn(str)
      .flatMap(m => CharsetRe.findFirstMatchIn(m.group(1)).map(_.group(1)))
    val declared = meta
      .orElse(Html5Re.findFirstMatchIn(str).map(_.group(1)))
      .orElse(XmlRe.findFirstMatchIn(str).map(_.group(1)))
    declared.getOrElse {
      if (content.length >= 3 && content(0) == 0xEF.toByte &&
        content(1) == 0xBB.toByte && content(2) == 0xBF.toByte) "UTF-8"
      else if (content.length >= 2 && content(0) == 0xFF.toByte && content(1) == 0xFE.toByte)
        "UTF-16LE"
      else if (content.length >= 2 && content(0) == 0xFE.toByte && content(1) == 0xFF.toByte)
        "UTF-16BE"
      else null
    }
  }

  /** Strict UTF-8 validation; an incomplete final sequence is tolerated
    * (the truncation guard may cut a page mid-character). */
  def isValidUtf8(content: Array[Byte]): Boolean = {
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    val out = CharBuffer.allocate(content.length + 1)
    // endOfInput = false: a trailing incomplete sequence yields UNDERFLOW,
    // real errors yield a malformed result
    !dec.decode(ByteBuffer.wrap(content), out, false).isError
  }

  /** Full resolution: header param → sniff → UTF-8 validation → default. */
  def detect(contentType: String, content: Array[Byte], defaultCharset: String): Charset =
    resolve(fromContentType(contentType))
      .orElse(resolve(sniff(content)))
      .getOrElse {
        if (content != null && isValidUtf8(content)) StandardCharsets.UTF_8
        else resolve(defaultCharset).getOrElse(StandardCharsets.UTF_8)
      }

  /** Decode fetched bytes with the detected charset; a leading BOM (left
    * in place by explicit UTF-8/UTF-16LE/BE decodes) is stripped. */
  def decode(contentType: String, content: Array[Byte], defaultCharset: String): String = {
    if (content == null) return ""
    val cs = detect(contentType, content, defaultCharset)
    val text = new String(content, cs)
    if (text.nonEmpty && text.charAt(0) == '\uFEFF') text.substring(1) else text
  }
}
