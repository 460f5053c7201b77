package graft.parse

import graft.frontier.CrawlConfig
import graft.schema.Span

/** RSS 2.0 / Atom 1.0 feed parser (reference src/plugin/feed
  * FeedParser.java:103-180, 219-280): one fetched feed yields a ParseResult
  * with one sub-document PER ENTRY — entry url = its link, entry text =
  * title + cleaned description/summary — plus the container document whose
  * spans are the feed title and a link span per entry (so the frontier
  * discovers entries through normal outlink processing even when a sink
  * only consumes container rows).
  *
  * From-scratch regex extraction over the charset-decoded text (same
  * discipline as [[Html]]/[[XmlDocParser]] — no XML libraries, no XXE
  * surface); CDATA unwrapped, entities decoded, inline markup stripped.
  */
object FeedDocParser extends MultiDocParser {

  private val Cdata = "(?s)<!\\[CDATA\\[(.*?)\\]\\]>".r
  private val Tag = "(?s)<[^>]*>".r
  private val Item = "(?s)<item[\\s>].*?</item>|<item/>".r
  private val Entry = "(?s)<entry[\\s>].*?</entry>".r
  private val Title = "(?s)<title[^>]*>(.*?)</title>".r
  private val RssLink = "(?s)<link[^>]*>(.*?)</link>".r
  private val AtomLink = "<link\\b[^>]*\\bhref\\s*=\\s*[\"']([^\"']*)[\"'][^>]*>".r
  private val AtomRel = "\\brel\\s*=\\s*[\"']([^\"']*)[\"']".r
  private val Description = "(?s)<description[^>]*>(.*?)</description>".r
  private val Summary = "(?s)<summary[^>]*>(.*?)</summary>".r
  private val AtomContent = "(?s)<content[^>]*>(.*?)</content>".r

  /** entry/item-shaped content ⇒ this parser applies (content sniff used by
    * the XML dispatch when the mime is just text/xml). */
  def looksLikeFeed(text: String): Boolean =
    text != null && (text.contains("<rss") || text.contains("<feed"))

  private def clean(raw: String): String = {
    val noCdata = Cdata.replaceAllIn(raw, m => java.util.regex.Matcher.quoteReplacement(m.group(1)))
    val noTags = Tag.replaceAllIn(noCdata, " ")
    // second strip pass: Atom type="html" content arrives entity-ESCAPED
    // (&lt;p&gt;…), so markup only becomes visible after entity decoding
    Tag.replaceAllIn(Html.decodeEntities(noTags), " ").replaceAll("\\s+", " ").trim
  }

  private def resolve(base: String, link: String): String = {
    val l = clean(link)
    if (l.isEmpty) null
    else if (l.startsWith("http://") || l.startsWith("https://")) l
    else
      try new java.net.URI(base).resolve(l).toString
      catch { case _: Exception => null }
  }

  /** (entryUrl, entryText) pairs in document order. */
  private def entries(url: String, text: String): Seq[(String, String)] = {
    val isAtom = !text.contains("<rss") && text.contains("<feed")
    val blocks = (if (isAtom) Entry else Item).findAllIn(text).toSeq
    blocks.flatMap { b =>
      val link =
        if (isAtom) {
          // rel="alternate" (or rel-less) link wins, like ROME's entry link
          val links = AtomLink.findAllMatchIn(b).toSeq
          val best = links.find { m =>
            AtomRel.findFirstMatchIn(m.matched).forall(_.group(1) == "alternate")
          }.orElse(links.headOption)
          best.map(m => resolve(url, m.group(1))).orNull
        } else RssLink.findFirstMatchIn(b).map(m => resolve(url, m.group(1))).orNull
      if (link == null) None
      else {
        val title = Title.findFirstMatchIn(b).map(m => clean(m.group(1))).getOrElse("")
        val body =
          (if (isAtom) Summary.findFirstMatchIn(b).orElse(AtomContent.findFirstMatchIn(b))
           else Description.findFirstMatchIn(b)).map(m => clean(m.group(1))).getOrElse("")
        Some(link -> s"$title $body".trim)
      }
    }
  }

  override def resultDocs(url: String, text: String, content: Array[Byte],
                          cfg: CrawlConfig): Seq[SubDoc] = {
    val es = entries(url, text)
    // feed title = first <title> OUTSIDE any entry (channel/feed level):
    // entries were scanned above; the channel title is simply the first
    // title in the document for well-formed feeds
    val feedTitle = Title.findFirstMatchIn(text).map(m => clean(m.group(1))).getOrElse("")
    val head = {
      val t = if (feedTitle.nonEmpty) Seq(Span("text", feedTitle, null, 0)) else Nil
      val links = es.zipWithIndex.map { case ((link, _), i) =>
        Span("link", null, link, t.size + i)
      }
      if (t.isEmpty && links.isEmpty) Seq(Span("text", "", null, 0)) else t ++ links
    }
    val subs = es.collect { case (link, entryText) if entryText.nonEmpty =>
      // entry URLs are real pages that also ride the link side — external
      SubDoc(link, "text/plain", Seq(Span("text", entryText, null, 0)), external = true)
    }
    SubDoc(url, "application/rss+xml", head) +: subs
  }
}
