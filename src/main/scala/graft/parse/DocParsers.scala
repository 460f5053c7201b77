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
  * any other XML degrades to one text span. */
object XmlDocParser extends DocParser {
  private val Loc = "(?s)<loc>\\s*(.*?)\\s*</loc>".r
  override def parse(url: String, text: String, content: Array[Byte], cfg: CrawlConfig): Seq[Span] = {
    if (text.contains("<urlset") || text.contains("<sitemapindex")) {
      Loc.findAllMatchIn(text).map(_.group(1))
        .map(Html.decodeEntities).filter(_.nonEmpty)
        .zipWithIndex.map { case (loc, i) => Span("link", null, loc, i) }
        .toSeq
    } else PlainTextDocParser.parse(url, text, content, cfg)
  }
}

/** Unparsable binary → one opaque media span referencing the URL itself
  * (the content rides in the segment; the span records the reference). */
object BinaryDocParser extends DocParser {
  override def needsText: Boolean = false
  override def parse(url: String, text: String, content: Array[Byte], cfg: CrawlConfig): Seq[Span] =
    Seq(Span("media", null, url, 0))
}

object DocParsers {

  /** Registry: resolved mime → parser. Dispatch like the reference's
    * mime-type plugin mapping: html + xhtml share the HTML parser; any
    * other "text/…" mime falls back to plain text; everything else is
    * opaque binary. */
  def forMime(mime: String): DocParser = mime match {
    case null => HtmlDocParser
    case "text/html" | "application/xhtml+xml" => HtmlDocParser
    case "application/xml" | "text/xml" | "application/rss+xml" | "application/atom+xml" =>
      XmlDocParser
    case m if m.startsWith("text/") => PlainTextDocParser
    case "application/json" | "application/javascript" => PlainTextDocParser
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
    val parser = forMime(mime)
    val text =
      if (parser.needsText) Charsets.decode(contentType, content, cfg.parserCharsetDefault)
      else null
    parser.parse(url, text, content, cfg)
  }
}
