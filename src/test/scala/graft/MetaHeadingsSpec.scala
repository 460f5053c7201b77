package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.parse.Html

/** parse-metatags + headings plugin semantics (reference
  * src/plugin/parse-metatags MetaTagsParser, src/plugin/headings
  * HeadingsParseFilter). */
class MetaHeadingsSpec extends AnyFunSuite {

  val page =
    """<html><head><title>T</title>
      |<meta name="Description" content="a fine page">
      |<meta name="KEYWORDS" content="one,two">
      |<meta name="author" content="someone">
      |<meta http-equiv="refresh" content="5">
      |</head><body>
      |<h1>First <b>Heading</b></h1>
      |<p>prose</p>
      |<h2> Second heading </h2>
      |<h1>Another h1</h1>
      |</body></html>""".stripMargin

  test("configured meta names extracted as metatag.<name>, lowercased, first wins") {
    val m = Html.extraMeta(page, Seq("description", "keywords"), Nil)
    assert(m == Map("metatag.description" -> "a fine page", "metatag.keywords" -> "one,two"))
  }

  test("headings: collapsed inner text; first-wins by default, '|'-joined multivalued") {
    val first = Html.extraMeta(page, Nil, Seq("h1", "h2"))
    assert(first("h1") == "First Heading")
    assert(first("h2") == "Second heading")
    val multi = Html.extraMeta(page, Nil, Seq("h1"), headingsMultivalued = true)
    assert(multi("h1") == "First Heading|Another h1")
  }

  test("missing names/headings simply absent; empty page yields empty map") {
    assert(Html.extraMeta(page, Seq("viewport"), Seq("h3")).isEmpty)
    assert(Html.extraMeta("<html></html>", Seq("description"), Seq("h1")).isEmpty)
  }
}
