package graft.parse

import graft.frontier.CrawlConfig
import graft.schema.Span

/** Mime-dispatched parse (the reference's ParserFactory/ParseUtil surface,
  * reference/src/java/org/apache/nutch/parse/ParserFactory.java:96-160,
  * ParseUtil.java:79-118, re-expressed as a plain registry keyed by the
  * RESOLVED mime — `graft.url.Mime.resolve` — instead of plugin.xml).
  *
  * Each parser turns fetched content into the engine's interleaved span
  * sequence; the rest of the pipeline (signatures, outlink post-processing,
  * OPIC distribution, updatedb) is parser-agnostic. Text parsers receive
  * `text` decoded with the PER-PAGE detected charset ([[Charsets]] —
  * Content-Type param → meta/BOM sniff → UTF-8 validation → configured
  * default), so Latin-1/Shift_JIS/GBK pages parse correctly instead of
  * mojibaking (which would silently corrupt signatures and dedup).
  */
trait DocParser extends Serializable {
  /** `text` is the charset-decoded content (null when [[needsText]] is
    * false); `content` the raw fetched bytes. */
  def parse(url: String, text: String, content: Array[Byte], cfg: CrawlConfig): Seq[Span]

  /** Whether dispatch should charset-decode the bytes for this parser. */
  def needsText: Boolean = true
}

/** A parser whose fetched container emits MULTIPLE parsed documents — the
  * reference's ParseResult multi-entry semantics (ParseResult.java:41-116).
  * `parse` degrades to the container (head) document's spans. */
trait MultiDocParser extends DocParser {
  def resultDocs(url: String, text: String, content: Array[Byte], cfg: CrawlConfig): Seq[SubDoc]
  override def parse(url: String, text: String, content: Array[Byte], cfg: CrawlConfig): Seq[Span] =
    resultDocs(url, text, content, cfg).head.spans
}

/** text/html + application/xhtml+xml → the real DOM-walking parser. */
object HtmlDocParser extends DocParser {
  override def parse(url: String, text: String, content: Array[Byte], cfg: CrawlConfig): Seq[Span] =
    Html.parse(url, text, cfg.htmlFormUseAction, cfg.htmlOutlinkIgnoreTags.toSet).spans
}

/** Any text mime → one whitespace-collapsed text span (parse-text
  * semantics, reference/src/plugin/parse-text). */
object PlainTextDocParser extends DocParser {
  override def parse(url: String, text: String, content: Array[Byte], cfg: CrawlConfig): Seq[Span] = {
    val t = text.replaceAll("\\s+", " ").trim
    if (t.isEmpty) Seq.empty else Seq(Span("text", t, null, 0))
  }
}

/** XML: sitemap documents (urlset/sitemapindex per sitemaps.org — the
  * reference parses them via crawler-commons SiteMapParser in
  * util/SitemapProcessor.java) yield their <loc> URLs as link spans;
  * RSS/Atom content served as generic XML is sniffed and delegated to the
  * feed parser (multi-doc); any other XML degrades to one text span. */
object XmlDocParser extends MultiDocParser {
  private val Loc = "(?s)<loc>\\s*(.*?)\\s*</loc>".r
  override def resultDocs(url: String, text: String, content: Array[Byte],
                          cfg: CrawlConfig): Seq[SubDoc] = {
    if (FeedDocParser.looksLikeFeed(text))
      FeedDocParser.resultDocs(url, text, content, cfg)
    else if (text.contains("<urlset") || text.contains("<sitemapindex")) {
      val spans = Loc.findAllMatchIn(text).map(_.group(1))
        .map(Html.decodeEntities).filter(_.nonEmpty)
        .zipWithIndex.map { case (loc, i) => Span("link", null, loc, i) }
        .toSeq
      Seq(SubDoc(url, "application/xml", spans))
    } else
      Seq(SubDoc(url, "application/xml", PlainTextDocParser.parse(url, text, content, cfg)))
  }
}

/** application/javascript → links mined from string literals (reference
  * src/plugin/parse-js JSParseFilter.java:191-248): every quoted literal
  * that looks URI-ish (has a '/' or '.' run, no whitespace) becomes an
  * outlink — "www."-prefixed literals get http://, relative ones resolve
  * against the page URL, &amp; unescaped — plus the script source as the
  * parse text (the reference indexes the script body). */
object JsDocParser extends DocParser {
  private val StringLit = java.util.regex.Pattern.compile(
    "(\\\\*(?:\"|'))([^\\s\"']+?)(?:\\1)",
    java.util.regex.Pattern.CASE_INSENSITIVE | java.util.regex.Pattern.MULTILINE)
  private val UriLike = java.util.regex.Pattern.compile(
    "(^|\\s*?)/?\\S+?[/\\.]\\S+($|\\s*)",
    java.util.regex.Pattern.CASE_INSENSITIVE | java.util.regex.Pattern.MULTILINE)

  /** URI-ish string literals of `script`, base-resolved; exposed so the
    * HTML path could mine inline scripts the same way. */
  def extractLinks(script: String, base: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val m = StringLit.matcher(script)
    while (m.find()) {
      val lit = m.group(2)
      if (UriLike.matcher(lit).matches()) {
        val resolved =
          if (lit.startsWith("www.")) "http://" + lit
          else Html.resolve(base, lit)
        if (resolved != null) out += resolved.replace("&amp;", "&")
      }
    }
    out.result()
  }

  override def parse(url: String, text: String, content: Array[Byte], cfg: CrawlConfig): Seq[Span] = {
    val body = text.replaceAll("\\s+", " ").trim
    val head = if (body.isEmpty) Nil else Seq(Span("text", body, null, 0))
    head ++ extractLinks(text, url).zipWithIndex.map { case (l, i) =>
      Span("link", null, l, head.size + i)
    }
  }
}

/** Unparsable binary → one opaque media span referencing the URL itself
  * (the content rides in the segment; the span records the reference). */
object BinaryDocParser extends DocParser {
  override def needsText: Boolean = false
  override def parse(url: String, text: String, content: Array[Byte], cfg: CrawlConfig): Seq[Span] =
    Seq(Span("media", null, url, 0))
}

/** One parsed document of a container parse — the reference's
  * parse/ParseResult.java multi-entry semantics (ParseResult.java:41-116):
  * one fetched container can emit several (url, parse) outputs, each of
  * which flows through the parsed segment and updatedb as its own row. */
final case class SubDoc(url: String, contentType: String, spans: Seq[Span],
                        external: Boolean = false)
// `external`: the sub-doc's URL is a REAL independently-linkable URL (feed
// entry) that may also appear on the discovered-link side — the executor
// must push it through the same canonicalize+filter chain as links or the
// two sides produce different frontier keys for one page. false = synthetic
// container-member URL (zip): already-fetched content, never on the link
// side, kept verbatim.

/** application/zip → container manifest + one sub-document per member
  * (reference src/plugin/parse-zip ZipTextExtractor.java:63-110: member
  * url = containerUrl + "/" + entryName, member mime resolved from the
  * file name, members parsed through the registry). Deviation, documented:
  * the reference concatenates all member text into the single container
  * doc (its zip plugin can only emit one doc); here every member IS a
  * sub-document carrying its own text, so the container keeps just the
  * member manifest. Zip-bomb guards: per-member + total byte caps, member
  * count cap, no nested-container recursion. */
object ZipDocParser extends MultiDocParser {
  val MaxMembers = 1000
  val MaxMemberBytes: Int = 4 * 1024 * 1024
  val MaxTotalBytes: Long = 64L * 1024 * 1024

  override def needsText: Boolean = false

  /** Container (head) + parsed members. Corrupt archives degrade to the
    * members read so far — one bad row must never fail a fetch task. */
  override def resultDocs(url: String, text: String, content: Array[Byte],
                          cfg: CrawlConfig): Seq[SubDoc] = {
    val subs = Seq.newBuilder[SubDoc]
    val names = Seq.newBuilder[String]
    var total = 0L
    var n = 0
    val zin = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(content))
    try {
      var entry = zin.getNextEntry
      while (entry != null && n < MaxMembers && total < MaxTotalBytes) {
        if (!entry.isDirectory) {
          val name = entry.getName
          val bytes = readCapped(zin, MaxMemberBytes)
          total += bytes.length
          n += 1
          names += name
          val memberUrl = s"$url/$name"
          val mime = graft.url.Mime.resolve(null, memberUrl)
          // no nested-container recursion (zip bombs); containers inside
          // containers degrade to opaque binary sub-docs
          val parser = mime match {
            case "application/zip" | "application/gzip" => BinaryDocParser
            case m => DocParsers.forMime(m)
          }
          val text =
            if (parser.needsText) Charsets.decode(null, bytes, cfg.parserCharsetDefault)
            else null
          subs += SubDoc(memberUrl, mime, parser.parse(memberUrl, text, bytes, cfg))
        }
        entry = if (n < MaxMembers && total < MaxTotalBytes) zin.getNextEntry else null
      }
    } catch {
      case scala.util.control.NonFatal(_) => () // truncated/corrupt zip: keep what we have
    } finally {
      try zin.close() catch { case _: Exception => () }
    }
    val manifest = names.result().mkString(" ")
    val container =
      if (manifest.isEmpty) Seq(Span("media", null, url, 0))
      else Seq(Span("text", manifest, null, 0))
    SubDoc(url, "application/zip", container) +: subs.result()
  }

  private def readCapped(in: java.io.InputStream, cap: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(8 * 1024)
    val buf = new Array[Byte](16 * 1024)
    var remaining = cap
    var r = 0
    while (remaining > 0 && { r = in.read(buf, 0, math.min(buf.length, remaining)); r >= 0 }) {
      out.write(buf, 0, r)
      remaining -= r
    }
    out.toByteArray
  }
}

object DocParsers {

  /** Registry: resolved mime → parser. Dispatch like the reference's
    * mime-type plugin mapping: html + xhtml share the HTML parser; any
    * other "text/…" mime falls back to plain text; everything else is
    * opaque binary. */
  def forMime(mime: String): DocParser = mime match {
    case null => HtmlDocParser
    case "text/html" | "application/xhtml+xml" => HtmlDocParser
    case "application/rss+xml" | "application/atom+xml" => FeedDocParser
    case "application/xml" | "text/xml" => XmlDocParser
    case "application/zip" => ZipDocParser
    case "application/pdf" => PdfDocParser
    case "application/javascript" | "text/javascript" => JsDocParser
    case m if m.startsWith("text/") => PlainTextDocParser
    case "application/json" => PlainTextDocParser
    case _ => BinaryDocParser
  }

  /** Fetch-side dispatch: resolve the mime (content magic → header →
    * extension → default), detect the charset, then parse. Mirrors
    * ParseUtil.parse's "pick parser by content type" with MimeUtil's magic
    * precedence — a server lying in its Content-Type header defeats
    * neither the dispatch nor the decode. */
  def parseSpans(contentType: String, url: String, content: Array[Byte],
                 cfg: CrawlConfig): Seq[Span] = {
    val mime = graft.url.Mime.resolveWithContent(contentType, url, content)
    val parser = cfg.extParsers.get(mime).map(ExtDocParser(mime, _)).getOrElse(forMime(mime))
    val text =
      if (parser.needsText) Charsets.decode(contentType, content, cfg.parserCharsetDefault)
      else null
    parser.parse(url, text, content, cfg)
  }

  /** Multi-document dispatch (reference ParseResult semantics): container
    * mimes emit the container PLUS one [[SubDoc]] per member; everything
    * else emits exactly one. Head is always the container/page itself. */
  def parseResult(contentType: String, url: String, content: Array[Byte],
                  cfg: CrawlConfig): Seq[SubDoc] = {
    val mime = graft.url.Mime.resolveWithContent(contentType, url, content)
    cfg.extParsers.get(mime).map(ExtDocParser(mime, _)).getOrElse(forMime(mime)) match {
      case p: MultiDocParser =>
        val text =
          if (p.needsText) Charsets.decode(contentType, content, cfg.parserCharsetDefault)
          else null
        p.resultDocs(url, text, content, cfg)
      case p =>
        val text =
          if (p.needsText) Charsets.decode(contentType, content, cfg.parserCharsetDefault)
          else null
        Seq(SubDoc(url, mime, p.parse(url, text, content, cfg)))
    }
  }
}
