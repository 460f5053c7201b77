package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.frontier.CrawlConfig
import graft.parse.{DocParsers, JsDocParser}

/** parse-js link mining from JavaScript string literals (reference
  * src/plugin/parse-js JSParseFilter.java:191-248). */
class JsParseSpec extends AnyFunSuite {

  val cfg = CrawlConfig()
  val base = "http://site.test/app/main.js"

  test("URI-ish literals extracted; www. gets http://; relative resolves; &amp; unescaped") {
    val script =
      """var a = "http://other.test/page?x=1&amp;y=2";
        |var b = 'www.example.com/start';
        |var c = "/abs/path.html";
        |var d = "rel/page.html";
        |var e = "not_a_url";
        |var f = "has space.html";
        |""".stripMargin
    val links = JsDocParser.extractLinks(script, base)
    assert(links.contains("http://other.test/page?x=1&y=2"))
    assert(links.contains("http://www.example.com/start"))
    assert(links.contains("http://site.test/abs/path.html"))
    assert(links.contains("http://site.test/app/rel/page.html"))
    assert(!links.exists(_.contains("not_a_url")))
    assert(!links.exists(_.contains("has space"))) // literal with whitespace never matches
  }

  test("parse: script text span first, then link spans in order") {
    val spans = JsDocParser.parse(base, """go("http://a.test/x.html");""", null, cfg)
    assert(spans.head.kind == "text" && spans.head.text.contains("go("))
    assert(spans.tail.map(_.media_ref) == Seq("http://a.test/x.html"))
    assert(spans.tail.head.offset == 1)
  }

  test("registry: .js extension and javascript mimes dispatch to the js parser") {
    val js = """var u = "http://t.test/found.html";""".getBytes("UTF-8")
    val byExt = DocParsers.parseSpans(null, "http://site.test/x.js", js, cfg)
    assert(byExt.exists(s => s.kind == "link" && s.media_ref == "http://t.test/found.html"))
    val byMime = DocParsers.parseSpans("text/javascript", "http://site.test/x", js, cfg)
    assert(byMime.exists(s => s.kind == "link" && s.media_ref == "http://t.test/found.html"))
  }
}
