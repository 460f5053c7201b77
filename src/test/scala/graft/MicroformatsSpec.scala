package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.parse.Microformats

/** microformats-reltag + creativecommons plugin semantics (reference
  * RelTagParser.java, CCParseFilter.java, CCIndexingFilter.java). */
class MicroformatsSpec extends AnyFunSuite {

  test("rel-tag: absolute hrefs only, last segment URL-decoded, sorted distinct") {
    val html =
      """<html><body>
        |<a rel="tag" href="http://ex.org/tags/scala">s</a>
        |<a rel="TAG" href="http://ex.org/tags/spark%20sql">case-insensitive rel</a>
        |<a rel="tag" href="http://ex.org/tags/scala">duplicate</a>
        |<a rel="tag" href="/relative/tags/nope">relative href rejected</a>
        |<a rel="tag">no href</a>
        |<a href="http://ex.org/tags/notag">no rel</a>
        |<a rel="nofollow" href="http://ex.org/tags/other">wrong rel</a>
        |</body></html>""".stripMargin
    assert(Microformats.relTags(html) == Seq("scala", "spark sql"))
    assert(Microformats.relTags(null).isEmpty)
    assert(Microformats.relTags("<p>no anchors</p>").isEmpty)
  }

  private val RdfComment =
    """<!--<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" """ +
    """xmlns:cc="http://web.resource.org/cc/" xmlns:dc="http://purl.org/dc/elements/1.1/">""" +
    """<cc:Work><dc:type rdf:resource="http://purl.org/dc/dcmitype/Sound"/></cc:Work>""" +
    """<cc:License rdf:about="http://creativecommons.org/licenses/by-sa/1.0/"></cc:License>""" +
    """</rdf:RDF>-->"""

  test("cc: precedence rdf > rel=license > plain CC anchor") {
    val page = "http://p.test/x"
    val relA = """<a rel="license" href="http://creativecommons.org/licenses/by-nc/2.0/">c</a>"""
    val plainA = """<a href="http://creativecommons.org/licenses/by/3.0/">c</a>"""

    val rdf = Microformats.ccInfo(page, s"<html><body>$RdfComment$relA$plainA</body></html>")
    assert(rdf.licenseUrl == "http://creativecommons.org/licenses/by-sa/1.0/")
    assert(rdf.licenseLocation == "rdf" && rdf.workType == "audio")

    val rel = Microformats.ccInfo(page, s"<html><body>$relA$plainA</body></html>")
    assert(rel.licenseUrl == "http://creativecommons.org/licenses/by-nc/2.0/")
    assert(rel.licenseLocation == "rel" && rel.workType == null)

    val plain = Microformats.ccInfo(page, s"<html><body>$plainA</body></html>")
    assert(plain.licenseUrl == "http://creativecommons.org/licenses/by/3.0/")
    assert(plain.licenseLocation == "a")

    val none = Microformats.ccInfo(page, "<html><body>nothing</body></html>")
    assert(none.licenseUrl == null && none.licenseLocation == null && none.workType == null)
  }

  test("cc: license-url gate — host, path prefix, relative resolution") {
    val page = "http://creativecommons.org/page"
    // non-CC host: not a license
    val other = Microformats.ccInfo(page,
      """<a rel="license" href="http://example.org/licenses/by/2.0/">x</a>""")
    assert(other.licenseUrl == null)
    // bare /licenses/ path (no license component): rejected
    val bare = Microformats.ccInfo(page,
      """<a rel="license" href="http://creativecommons.org/licenses/">x</a>""")
    assert(bare.licenseUrl == null)
    // relative href resolves against the page url (reference `new URL(base, href)`)
    val relResolved = Microformats.ccInfo(page,
      """<a rel="license" href="/licenses/by/2.5/">x</a>""")
    assert(relResolved.licenseUrl == "http://creativecommons.org/licenses/by/2.5/")
    assert(relResolved.licenseLocation == "rel")
  }

  test("ccFeatures: license url split at / and -, meta location, work type") {
    val f = Microformats.ccFeatures(Microformats.CcInfo(
      "http://creativecommons.org/licenses/by-nc-sa/2.0/", "rel", "video"))
    assert(f == Seq("license=http://creativecommons.org/licenses/by-nc-sa/2.0/",
      "by", "nc", "sa", "2.0", "meta=rel", "video"))
    assert(Microformats.ccFeatures(Microformats.CcInfo(null, null, null)).isEmpty)
  }
}
