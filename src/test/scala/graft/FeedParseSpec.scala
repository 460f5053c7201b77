package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.frontier.CrawlConfig
import graft.parse.{DocParsers, FeedDocParser}

/** RSS/Atom feed parsing (reference src/plugin/feed FeedParser): one
  * sub-document per entry, container carries feed title + entry links. */
class FeedParseSpec extends AnyFunSuite {

  val cfg = CrawlConfig()

  val rss =
    """<?xml version="1.0"?>
      |<rss version="2.0"><channel>
      |<title>Graft Blog</title>
      |<link>http://blog.example.com/</link>
      |<item>
      |  <title>First &amp; Post</title>
      |  <link>http://blog.example.com/posts/1</link>
      |  <description><![CDATA[Hello <b>world</b> of feeds]]></description>
      |</item>
      |<item>
      |  <title>Second</title>
      |  <link>/posts/2</link>
      |  <description>Relative link entry</description>
      |</item>
      |<item><title>No link, skipped</title></item>
      |</channel></rss>""".stripMargin

  val atom =
    """<?xml version="1.0"?>
      |<feed xmlns="http://www.w3.org/2005/Atom">
      |<title>Atom Feed</title>
      |<entry>
      |  <title>Entry One</title>
      |  <link rel="self" href="http://a.example.com/self1"/>
      |  <link rel="alternate" href="http://a.example.com/e1"/>
      |  <summary>Summary one</summary>
      |</entry>
      |<entry>
      |  <title>Entry Two</title>
      |  <link href="http://a.example.com/e2"/>
      |  <content type="html">&lt;p&gt;Body two&lt;/p&gt;</content>
      |</entry>
      |</feed>""".stripMargin

  test("RSS: container has title + entry links; one sub-doc per linked entry") {
    val docs = FeedDocParser.resultDocs("http://blog.example.com/feed.xml", rss, null, cfg)
    assert(docs.size == 3) // container + 2 linked entries (link-less item skipped)
    val head = docs.head
    assert(head.url == "http://blog.example.com/feed.xml")
    assert(head.spans.head.kind == "text" && head.spans.head.text == "Graft Blog")
    val links = head.spans.filter(_.kind == "link").map(_.media_ref)
    assert(links == Seq("http://blog.example.com/posts/1", "http://blog.example.com/posts/2"))
    val e1 = docs(1)
    assert(e1.url == "http://blog.example.com/posts/1")
    assert(e1.spans.head.text == "First & Post Hello world of feeds")
    assert(docs(2).url == "http://blog.example.com/posts/2")
    assert(docs(2).spans.head.text == "Second Relative link entry")
  }

  test("Atom: rel=alternate link wins; summary or content becomes entry text") {
    val docs = FeedDocParser.resultDocs("http://a.example.com/feed", atom, null, cfg)
    assert(docs.size == 3)
    assert(docs.head.spans.head.text == "Atom Feed")
    assert(docs(1).url == "http://a.example.com/e1")
    assert(docs(1).spans.head.text == "Entry One Summary one")
    assert(docs(2).url == "http://a.example.com/e2")
    assert(docs(2).spans.head.text == "Entry Two Body two")
  }

  test("dispatch: rss mime and text/xml-sniffed feeds both route to the feed parser") {
    val viaMime = DocParsers.parseResult("application/rss+xml; charset=utf-8",
      "http://blog.example.com/feed.xml", rss.getBytes("UTF-8"), cfg)
    assert(viaMime.size == 3 && viaMime(1).url.endsWith("/posts/1"))
    // a feed served as generic XML: the XML parser sniffs <rss and delegates
    val viaXml = DocParsers.parseResult("text/xml",
      "http://blog.example.com/feed.xml", rss.getBytes("UTF-8"), cfg)
    assert(viaXml.size == 3 && viaXml(2).url.endsWith("/posts/2"))
    // sitemaps still parse as sitemaps
    val sitemap = """<urlset><url><loc>http://s.example.com/a</loc></url></urlset>"""
    val viaSitemap = DocParsers.parseResult("text/xml",
      "http://s.example.com/sitemap.xml", sitemap.getBytes("UTF-8"), cfg)
    assert(viaSitemap.size == 1 &&
      viaSitemap.head.spans == Seq(graft.schema.Span("link", null, "http://s.example.com/a", 0)))
  }

  test("malformed feed degrades, never throws") {
    val broken = "<rss><channel><title>X</title><item><link>http://b.example/e"
    val docs = FeedDocParser.resultDocs("http://b.example/f", broken, null, cfg)
    assert(docs.size == 1) // unclosed item: no entries, container only
    assert(docs.head.spans.head.text == "X")
  }
}
