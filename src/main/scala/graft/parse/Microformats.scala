package graft.parse

import java.net.URLDecoder
import java.nio.charset.StandardCharsets

/** Microformat extractors over raw HTML: rel-tag (reference
  * src/plugin/microformats-reltag/RelTagParser.java) and Creative Commons
  * license detection (reference src/plugin/creativecommons/CCParseFilter
  * .java + CCIndexingFilter.java). Pure functions over the page — applied
  * as scalar UDF columns at parse/index time; no shuffles. */
object Microformats {

  /** rel-tag (RelTagParser.parse:40-75): every <a href rel="tag"> anchor
    * contributes the URL-decoded last path segment of its ABSOLUTE href
    * (the reference's `new URL(href)` rejects relative hrefs) — returned
    * sorted distinct (TreeSet semantics). */
  def relTags(html: String): Seq[String] = {
    if (html == null) return Seq.empty
    val tags = collection.mutable.TreeSet.empty[String]
    def walk(n: Html.HNode): Unit = n match {
      case e: Html.HElem =>
        if (e.name == "a" && e.attrs.get("rel").exists(_.equalsIgnoreCase("tag")))
          e.attrs.get("href").foreach { href =>
            try {
              val u = new java.net.URI(href)
              if (u.isAbsolute && u.getPath != null) {
                val p = u.getPath
                val tag = URLDecoder.decode(p.substring(p.lastIndexOf('/') + 1),
                  StandardCharsets.UTF_8)
                if (tag.nonEmpty) tags += tag
              }
            } catch { case _: Exception => /* malformed tag href, skip */ }
          }
        e.children.foreach(walk)
      case _ =>
    }
    walk(Html.parseDom(html))
    tags.toSeq
  }

  /** Creative Commons license info. Nulls when absent. */
  final case class CcInfo(licenseUrl: String, licenseLocation: String, workType: String)

  private val CcNs = "http://web.resource.org/cc/"
  private val DcNs = "http://purl.org/dc/elements/1.1/"
  private val RdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  private val CommentRe = "(?s)<!--(.*?)-->".r

  /** CCParseFilter's WORK_TYPE_NAMES (dcmitype URI → short name). */
  private val WorkTypeNames = Map(
    "http://purl.org/dc/dcmitype/MovingImage" -> "video",
    "http://purl.org/dc/dcmitype/StillImage" -> "image",
    "http://purl.org/dc/dcmitype/Sound" -> "audio",
    "http://purl.org/dc/dcmitype/Text" -> "text",
    "http://purl.org/dc/dcmitype/Interactive" -> "interactive",
    "http://purl.org/dc/dcmitype/Software" -> "software",
    "http://purl.org/dc/dcmitype/Image" -> "image")

  /** CC license detection (CCParseFilter.Walker.walk:80-118): precedence is
    * RDF-in-comment subject, then <a rel="license">, then any anchor whose
    * resolved href is a creativecommons.org/licenses/ URL; the RDF block
    * also yields the work type (cc:Work / dc:type rdf:resource). */
  def ccInfo(pageUrl: String, html: String): CcInfo = {
    if (html == null) return CcInfo(null, null, null)
    var relLicense: String = null
    var anchorLicense: String = null

    def walk(n: Html.HNode): Unit = n match {
      case e: Html.HElem =>
        if (e.name == "a") e.attrs.get("href").foreach { href =>
          val resolved = Html.resolve(pageUrl, href)
          if (resolved != null) {
            try {
              val u = new java.net.URI(resolved)
              // CC license URL gate (findLicenseUrl:139-166): http +
              // creativecommons.org + /licenses/<something>
              if ("http".equalsIgnoreCase(u.getScheme) &&
                  "creativecommons.org".equalsIgnoreCase(u.getHost) &&
                  u.getPath != null && u.getPath.startsWith("/licenses/") &&
                  u.getPath.length > "/licenses/".length) {
                if (e.attrs.get("rel").contains("license")) {
                  if (relLicense == null) relLicense = resolved
                } else if (anchorLicense == null) anchorLicense = resolved
              }
            } catch { case _: Exception => }
          }
        }
        e.children.foreach(walk)
      case _ =>
    }
    walk(Html.parseDom(html))

    // RDF blocks live in comments (the DOM drops them): scan the raw text,
    // then parse the candidate namespace-aware like the reference
    var rdfLicense: String = null
    var workType: String = null
    for (m <- CommentRe.findAllMatchIn(html)) {
      val comment = m.group(1)
      if (rdfLicense == null && comment.contains("RDF") && comment.contains(CcNs)) {
        try {
          val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
          f.setNamespaceAware(true)
          val doc = f.newDocumentBuilder()
            .parse(new org.xml.sax.InputSource(new java.io.StringReader(comment)))
          val roots = doc.getElementsByTagNameNS(RdfNs, "RDF")
          if (roots.getLength == 1) {
            val rdf = roots.item(0).asInstanceOf[org.w3c.dom.Element]
            val licenses = rdf.getElementsByTagNameNS(CcNs, "License")
            var i = 0
            while (i < licenses.getLength) {
              val about = licenses.item(i).asInstanceOf[org.w3c.dom.Element]
                .getAttributeNodeNS(RdfNs, "about")
              if (about != null) rdfLicense = about.getValue
              i += 1
            }
            val works = rdf.getElementsByTagNameNS(CcNs, "Work")
            if (works.getLength > 0) {
              val types = rdf.getElementsByTagNameNS(DcNs, "type")
              var j = 0
              while (j < types.getLength) {
                val res = types.item(j).asInstanceOf[org.w3c.dom.Element]
                  .getAttributeNodeNS(RdfNs, "resource")
                if (res != null) workType = WorkTypeNames.getOrElse(res.getValue, null)
                j += 1
              }
            }
          }
        } catch { case _: Exception => /* unparseable RDF comment, skip */ }
      }
    }

    val (url, loc) =
      if (rdfLicense != null) (rdfLicense, "rdf")
      else if (relLicense != null) (relLicense, "rel")
      else if (anchorLicense != null) (anchorLicense, "a")
      else (null, null)
    CcInfo(url, loc, workType)
  }

  /** CCIndexingFilter's multi-valued `cc` field (filter:58-90): the whole
    * license URL, the path components of the license split at '/' and '-'
    * (the "licenses" head token discarded), the location as meta=, and the
    * work type. Order mirrors the reference's add sequence. */
  def ccFeatures(info: CcInfo): Seq[String] = {
    val out = collection.mutable.ArrayBuffer.empty[String]
    if (info.licenseUrl != null) {
      out += s"license=${info.licenseUrl}"
      try {
        val path = new java.net.URI(info.licenseUrl).getPath
        if (path != null) {
          val toks = path.split("[/-]").filter(_.nonEmpty)
          out ++= toks.drop(1) // discard the "licenses" head
        }
      } catch { case _: Exception => }
    }
    if (info.licenseLocation != null) out += s"meta=${info.licenseLocation}"
    if (info.workType != null) out += info.workType
    out.toSeq
  }
}
