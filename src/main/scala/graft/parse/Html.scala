package graft.parse

import java.util.Locale
import scala.collection.mutable

import graft.schema.Span

/** Real HTML parsing (SURVEY.md §2.9 "Parse dispatch / HTML parse").
  *
  * Semantics replicate the reference's DOM pipeline — tag table, link
  * throwaway rules, img-alt anchor fallback, rel=nofollow / form-post
  * suppression, base-href resolution, whitespace-collapsed text, title,
  * meta-robots and meta-refresh:
  *  - outlink table + extraction:
  *    reference/src/plugin/parse-html/.../DOMContentUtils.java:84-97,330-493
  *  - text/title/base walks: DOMContentUtils.java:152-312
  *  - meta tags (robots/refresh/base): .../HTMLMetaProcessor.java:41-190
  *  - noindex ⇒ no text, nofollow ⇒ no links, refresh ⇒ redirect:
  *    .../HtmlParser.java:205-239
  *
  * The implementation is original: a forgiving single-pass tokenizer builds
  * a minimal node tree (no external HTML library ships in this environment),
  * and one document-order walk assembles the engine's interleaved span
  * sequence — text runs between link/media elements become text spans, so
  * the output is exactly the `(kind, text, media_ref, offset)` shape the
  * rest of the pipeline consumes (input_hint invariant).
  */
object Html {

  // ---------- minimal DOM ----------

  sealed trait HNode
  final case class HElem(name: String, attrs: Map[String, String],
                         children: mutable.ArrayBuffer[HNode]) extends HNode
  final case class HText(value: String) extends HNode

  /** Elements that never have children in HTML (self-closing by spec). */
  private val VoidElements = Set(
    "area", "base", "br", "col", "embed", "frame", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr")

  /** Forgiving HTML → node tree. Never throws: unclosed tags are closed at
    * EOF, stray close tags are ignored, script/style bodies are treated as
    * opaque raw text (skipped), comments and declarations are dropped. */
  def parseDom(html: String): HElem = {
    val root = HElem("#root", Map.empty, mutable.ArrayBuffer.empty)
    if (html == null) return root
    val stack = mutable.ArrayBuffer[HElem](root)
    def top: HElem = stack.last
    val n = html.length
    var i = 0
    val text = new StringBuilder

    def flushText(): Unit = {
      if (text.nonEmpty) {
        top.children += HText(decodeEntities(text.toString))
        text.clear()
      }
    }

    while (i < n) {
      val c = html.charAt(i)
      if (c != '<') { text.append(c); i += 1 }
      else if (html.startsWith("<!--", i)) {
        flushText()
        val end = html.indexOf("-->", i + 4)
        i = if (end < 0) n else end + 3
      } else if (i + 1 < n && (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?')) {
        flushText()
        val end = html.indexOf('>', i)
        i = if (end < 0) n else end + 1
      } else if (i + 1 < n && html.charAt(i + 1) == '/') {
        flushText()
        val end = html.indexOf('>', i)
        val name = html.substring(i + 2, if (end < 0) n else end).trim.toLowerCase(Locale.ROOT)
        // pop to the matching open tag if one is on the stack; else ignore
        val idx = stack.lastIndexWhere(_.name == name)
        if (idx > 0) stack.remove(idx, stack.length - idx)
        i = if (end < 0) n else end + 1
      } else if (i + 1 < n && isNameStart(html.charAt(i + 1))) {
        flushText()
        val (elem, selfClosed, next) = parseTag(html, i)
        i = next
        top.children += elem
        val nm = elem.name
        if (!selfClosed && !VoidElements.contains(nm)) {
          if (nm == "script" || nm == "style") {
            // raw text element: skip to the matching close tag, drop the body
            val close = "</" + nm
            val idx2 = indexOfIgnoreCase(html, close, i)
            if (idx2 < 0) i = n
            else {
              val gt = html.indexOf('>', idx2)
              i = if (gt < 0) n else gt + 1
            }
          } else stack += elem
        }
      } else { text.append(c); i += 1 } // lone '<'
    }
    flushText()
    root
  }

  private def isNameStart(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  private def indexOfIgnoreCase(s: String, sub: String, from: Int): Int = {
    val lower = sub.toLowerCase(Locale.ROOT)
    var i = math.max(0, from)
    val limit = s.length - lower.length
    while (i <= limit) {
      if (s.regionMatches(true, i, lower, 0, lower.length)) return i
      i += 1
    }
    -1
  }

  /** Parse "<name attr=v ...>" starting at `start` (which points at '<').
    * Returns (element, selfClosed, indexAfterTag). */
  private def parseTag(html: String, start: Int): (HElem, Boolean, Int) = {
    val n = html.length
    var i = start + 1
    val nameStart = i
    while (i < n && (html.charAt(i).isLetterOrDigit || html.charAt(i) == '-' || html.charAt(i) == ':')) i += 1
    val name = html.substring(nameStart, i).toLowerCase(Locale.ROOT)
    val attrs = Map.newBuilder[String, String]
    var selfClosed = false
    var closed = false
    while (i < n && !closed) {
      val c = html.charAt(i)
      if (c == '>') { closed = true; i += 1 }
      else if (c == '/' && i + 1 < n && html.charAt(i + 1) == '>') { selfClosed = true; closed = true; i += 2 }
      else if (c.isWhitespace) i += 1
      else {
        // attribute name
        val as = i
        while (i < n && !html.charAt(i).isWhitespace && html.charAt(i) != '=' &&
               html.charAt(i) != '>' && html.charAt(i) != '/') i += 1
        val aname = html.substring(as, i).toLowerCase(Locale.ROOT)
        if (aname.isEmpty) i += 1 // stray delimiter ('/', '='): always progress
        else {
          while (i < n && html.charAt(i).isWhitespace) i += 1
          var avalue = ""
          if (i < n && html.charAt(i) == '=') {
            i += 1
            while (i < n && html.charAt(i).isWhitespace) i += 1
            if (i < n && (html.charAt(i) == '"' || html.charAt(i) == '\'')) {
              val q = html.charAt(i); i += 1
              val vs = i
              while (i < n && html.charAt(i) != q) i += 1
              avalue = html.substring(vs, i)
              if (i < n) i += 1
            } else {
              val vs = i
              while (i < n && !html.charAt(i).isWhitespace && html.charAt(i) != '>') i += 1
              avalue = html.substring(vs, i)
            }
          }
          attrs += aname -> decodeEntities(avalue)
        }
      }
    }
    (HElem(name, attrs.result(), mutable.ArrayBuffer.empty), selfClosed, i)
  }

  /** Named + numeric character references (the common web subset). */
  def decodeEntities(s: String): String = {
    if (s == null || s.indexOf('&') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val ent = s.substring(i + 1, semi)
          val decoded: String = ent match {
            case "amp" => "&"
            case "lt" => "<"
            case "gt" => ">"
            case "quot" => "\""
            case "apos" => "'"
            case "nbsp" => " "
            case _ if ent.startsWith("#x") || ent.startsWith("#X") =>
              try String.valueOf(Integer.parseInt(ent.substring(2), 16).toChar)
              catch { case _: Exception => null }
            case _ if ent.startsWith("#") =>
              try String.valueOf(Integer.parseInt(ent.substring(1)).toChar)
              catch { case _: Exception => null }
            case _ => null
          }
          if (decoded != null) { sb.append(decoded); i = semi + 1 }
          else { sb.append(c); i += 1 }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  // ---------- reference URL resolution ----------

  /** Resolve `target` against `base` (reference URLUtil.resolveURL /
    * java.net.URL semantics, hand-rolled to be total — never throws). */
  def resolve(base: String, target: String): String = {
    if (target == null || target.isEmpty) return base
    val t = target.trim
    if (t.isEmpty || t.startsWith("#")) return base
    val schemeIdx = t.indexOf("://")
    if (schemeIdx > 0 && schemeIdx < 10) return t // absolute
    if (t.startsWith("javascript:") || t.startsWith("mailto:") || t.startsWith("data:")) return null
    val bi = base.indexOf("://")
    if (bi < 0) return t
    val scheme = base.substring(0, bi)
    val afterScheme = base.substring(bi + 3)
    val slash = afterScheme.indexOf('/')
    val authority = if (slash < 0) afterScheme else afterScheme.substring(0, slash)
    val basePathQ = if (slash < 0) "/" else afterScheme.substring(slash)
    val q = basePathQ.indexOf('?')
    val basePath = if (q < 0) basePathQ else basePathQ.substring(0, q)
    if (t.startsWith("//")) return scheme + ":" + t
    if (t.startsWith("/")) return scheme + "://" + authority + normalizePath(t)
    if (t.startsWith("?")) return scheme + "://" + authority + basePath + t
    // relative: resolve against the base directory
    val dir = basePath.substring(0, basePath.lastIndexOf('/') + 1)
    scheme + "://" + authority + normalizePath(dir + t)
  }

  /** Collapse "." and ".." path segments (query preserved untouched). */
  private def normalizePath(pathQ: String): String = {
    val qi = pathQ.indexOf('?')
    val path = if (qi < 0) pathQ else pathQ.substring(0, qi)
    val query = if (qi < 0) "" else pathQ.substring(qi)
    val out = mutable.ArrayBuffer.empty[String]
    for (seg <- path.split("/", -1)) seg match {
      case "." => // drop
      case ".." => if (out.nonEmpty && out.last.nonEmpty) out.remove(out.length - 1)
      case s => out += s
    }
    val joined = out.mkString("/")
    val withSlash =
      if (path.endsWith("/") && !joined.endsWith("/")) joined + "/" else joined
    (if (withSlash.startsWith("/")) withSlash else "/" + withSlash) + query
  }

  // ---------- tag table (DOMContentUtils.java:84-97) ----------

  final case class LinkParams(attr: String, childLen: Int, media: Boolean)

  def linkParams(formUseAction: Boolean, ignoreTags: Set[String]): Map[String, LinkParams] = {
    val base = Map(
      "a" -> LinkParams("href", 1, media = false),
      "area" -> LinkParams("href", 0, media = false),
      "frame" -> LinkParams("src", 0, media = false),
      "iframe" -> LinkParams("src", 0, media = false),
      "script" -> LinkParams("src", 0, media = false),
      "link" -> LinkParams("href", 0, media = false),
      "img" -> LinkParams("src", 0, media = true),
      "source" -> LinkParams("src", 0, media = true)) ++
      (if (formUseAction) Map("form" -> LinkParams("action", 1, media = false)) else Map.empty)
    base -- ignoreTags.filterNot(t => formUseAction && t == "form")
  }

  // ---------- meta tags (HTMLMetaProcessor semantics) ----------

  final case class MetaTags(noIndex: Boolean, noFollow: Boolean,
                            baseHref: Option[String],
                            refreshHref: Option[String], refreshTime: Int)

  def metaTags(root: HElem, pageUrl: String): MetaTags = {
    var noIndex = false; var noFollow = false
    var base: Option[String] = None
    var refreshHref: Option[String] = None; var refreshTime = -1
    def walk(node: HNode): Unit = node match {
      case e: HElem =>
        e.name match {
          case "base" if base.isEmpty =>
            e.attrs.get("href").filter(_.nonEmpty).foreach(h => base = Some(h))
          case "meta" =>
            val name = e.attrs.getOrElse("name", e.attrs.getOrElse("http-equiv", ""))
              .toLowerCase(Locale.ROOT)
            val content = e.attrs.getOrElse("content", "")
            name match {
              case "robots" =>
                val d = content.toLowerCase(Locale.ROOT)
                if (d.contains("none") || d.contains("noindex")) noIndex = true
                if (d.contains("none") || d.contains("nofollow")) noFollow = true
              case "refresh" =>
                val semi = content.indexOf(';')
                val timeStr = (if (semi < 0) content else content.substring(0, semi)).trim
                refreshTime = timeStr.toIntOption.getOrElse(-1)
                if (refreshTime >= 0) {
                  val url = if (semi < 0) pageUrl else {
                    val rest = content.substring(semi + 1).trim
                    val eq = rest.toLowerCase(Locale.ROOT).indexOf("url=")
                    val raw = if (eq >= 0) rest.substring(eq + 4).trim else ""
                    if (raw.isEmpty) pageUrl else resolve(pageUrl, raw)
                  }
                  if (url != null) refreshHref = Some(url)
                }
              case _ =>
            }
          case _ =>
        }
        e.children.foreach(walk)
      case _ =>
    }
    walk(root)
    MetaTags(noIndex, noFollow, base, refreshHref, refreshTime)
  }

  // ---------- text extraction (DOMContentUtils.getText discipline) ----------

  /** Append `raw` with whitespace runs collapsed to single spaces and
    * outer whitespace trimmed (hand-rolled: this runs once per text node on
    * every parsed page — no per-call regex compilation). */
  private def appendText(sb: StringBuilder, raw: String): Unit = {
    var i = 0
    val n = raw.length
    while (i < n && raw.charAt(i).isWhitespace) i += 1 // leading trim
    if (i >= n) return
    if (sb.nonEmpty && sb.charAt(sb.length - 1) != ' ') sb.append(' ')
    var pendingSpace = false
    while (i < n) {
      val c = raw.charAt(i)
      if (c.isWhitespace) pendingSpace = true
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
  }

  /** Whitespace-collapsed text beneath `node`, skipping script/style. */
  def textOf(node: HNode): String = {
    val sb = new StringBuilder
    def walk(n: HNode): Unit = n match {
      case HText(v) => appendText(sb, v)
      case e: HElem if e.name == "script" || e.name == "style" =>
      case e: HElem => e.children.foreach(walk)
    }
    walk(node)
    sb.toString
  }

  /** parse-metatags + headings plugins (reference src/plugin/parse-metatags
    * MetaTagsParser.java — configured meta names lifted into parse_meta as
    * `metatag.<name>` with lowercased names — and src/plugin/headings
    * HeadingsParseFilter.java — configured heading elements' collapsed text,
    * first-wins or '|'-joined when multivalued). One DOM walk. */
  def extraMeta(
      html: String,
      metatagNames: Seq[String],
      headingTags: Seq[String],
      headingsMultivalued: Boolean = false): Map[String, String] = {
    val root = parseDom(html)
    val wantMeta = metatagNames.map(_.toLowerCase(Locale.ROOT)).toSet
    val wantHead = headingTags.map(_.toLowerCase(Locale.ROOT)).toSet
    val metas = mutable.LinkedHashMap.empty[String, String]
    val heads = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[String]]
    def walk(n: HNode): Unit = n match {
      case e: HElem =>
        e.name match {
          case "meta" =>
            val name = e.attrs.getOrElse("name",
              e.attrs.getOrElse("http-equiv", "")).toLowerCase(Locale.ROOT)
            if (wantMeta(name) && !metas.contains(s"metatag.$name"))
              metas += s"metatag.$name" -> e.attrs.getOrElse("content", "")
          case h if wantHead(h) =>
            val t = textOf(e).trim
            if (t.nonEmpty) heads.getOrElseUpdate(h, mutable.ArrayBuffer.empty) += t
          case _ =>
        }
        e.children.foreach(walk)
      case _ =>
    }
    walk(root)
    val headFields = heads.map { case (h, vs) =>
      h -> (if (headingsMultivalued) vs.mkString("|") else vs.head)
    }
    (metas ++ headFields).toMap
  }

  /** First <title> text (head section). */
  def titleOf(root: HElem): String = {
    def find(n: HNode): Option[HElem] = n match {
      case e: HElem if e.name == "title" => Some(e)
      case e: HElem if e.name == "body" => None
      case e: HElem => e.children.iterator.map(find).collectFirst { case Some(t) => t }
      case _ => None
    }
    find(root).map(textOf).getOrElse("")
  }

  // ---------- outlink + span assembly ----------

  /** The reference's empty-link throwaway heuristics
    * (DOMContentUtils.shouldThrowAwayLink, :330-378). */
  private def shouldThrowAway(e: HElem, params: LinkParams): Boolean = {
    val ch = e.children
    def isWs(n: HNode): Boolean = n match {
      case HText(v) => v.forall(_.isWhitespace)
      case _ => false
    }
    def isSame(n: HNode): Boolean = n match {
      case c: HElem => c.name == e.name
      case _ => false
    }
    ch.length match {
      case 0 => params.childLen != 0 // no inner structure for a childful tag
      case 1 => isSame(ch(0))
      case 2 => (isSame(ch(0)) && isWs(ch(1))) || (isSame(ch(1)) && isWs(ch(0)))
      case 3 => isSame(ch(1)) && isWs(ch(0)) && isWs(ch(2))
      case _ => false
    }
  }

  /** Anchor text: whitespace-collapsed inner text; when empty, the img-alt
    * fallback (DOMContentUtils.java:416-446). */
  private def anchorText(e: HElem): String = {
    val t = textOf(e)
    if (t.nonEmpty) t
    else {
      val sb = new StringBuilder
      def walk(n: HNode): Unit = n match {
        case c: HElem if c.name == "img" =>
          c.attrs.get("alt").map(_.trim).filter(_.nonEmpty).foreach { alt =>
            if (sb.nonEmpty) sb.append(' '); sb.append(alt)
          }
          c.children.foreach(walk)
        case c: HElem => c.children.foreach(walk)
        case _ =>
      }
      walk(e)
      sb.toString
    }
  }

  final case class ParseResult(title: String, text: String, spans: Seq[Span],
                               meta: MetaTags)

  private val NofollowRel = "(?i).*\\bnofollow\\b.*".r

  /** Full HTML parse: mirror of HtmlParser.getParse + DOMContentUtils walks,
    * producing the engine's interleaved span sequence in document order.
    * meta noindex ⇒ no text spans; meta nofollow ⇒ no link/media spans;
    * meta refresh ⇒ a leading full-score redirect span. */
  def parse(pageUrl: String, html: String,
            formUseAction: Boolean = true,
            ignoreTags: Set[String] = Set.empty): ParseResult = {
    val root = parseDom(html)
    val meta = metaTags(root, pageUrl)
    val baseUrl = meta.baseHref.map(h => resolve(pageUrl, h)).filter(_ != null).getOrElse(pageUrl)
    val params = linkParams(formUseAction, ignoreTags)

    val spans = mutable.ArrayBuffer.empty[Span]
    val textBuf = new StringBuilder
    def flushText(): Unit = {
      val t = textBuf.toString.trim
      textBuf.clear()
      if (t.nonEmpty && !meta.noIndex) spans += Span("text", t, null, spans.length)
    }
    def emitLink(kind: String, anchor: String, target: String): Unit = {
      if (!meta.noFollow) {
        flushText()
        spans += Span(kind, if (anchor.isEmpty) null else anchor, target, spans.length)
      }
    }

    meta.refreshHref.filter(_ != pageUrl).foreach { r =>
      spans += Span("redirect", null, r, spans.length)
    }

    // document-order walk. `inAnchor`: inside a childful link element, whose
    // inner text IS the anchor text — suppress text accumulation but keep
    // discovering nested link/media elements (the reference's outer walker
    // also descends into childLen==1 elements, DOMContentUtils.java:489-491).
    def walk(n: HNode, inAnchor: Boolean): Unit = n match {
      case HText(v) => if (!inAnchor) appendText(textBuf, v)
      case e: HElem if e.name == "script" || e.name == "style" =>
        params.get(e.name).foreach { p => // script src is still an outlink
          linkTarget(e, p).foreach { tgt => emitLink(kindOf(e.name, p), "", tgt) }
        }
      case e: HElem if e.name == "title" => // title handled as leading text
        if (!inAnchor) appendText(textBuf, textOf(e))
      case e: HElem =>
        params.get(e.name) match {
          case Some(p) if !shouldThrowAway(e, p) =>
            linkTarget(e, p) match {
              case Some(tgt) => emitLink(kindOf(e.name, p), anchorText(e), tgt)
              case None =>
            }
            if (p.childLen != 0) e.children.foreach(walk(_, inAnchor = true))
          case Some(p) =>
            if (p.childLen != 0) e.children.foreach(walk(_, inAnchor))
          case None =>
            e.children.foreach(walk(_, inAnchor))
        }
      case _ =>
    }

    def linkTarget(e: HElem, p: LinkParams): Option[String] = {
      val noFollowRel = e.attrs.get("rel").exists(r => NofollowRel.matches(r))
      val isPost = e.attrs.get("method").exists(_.equalsIgnoreCase("post"))
      if (noFollowRel || isPost) None
      else e.attrs.get(p.attr).flatMap(t => Option(resolve(baseUrl, t))).filter(_.nonEmpty)
    }
    def kindOf(name: String, p: LinkParams): String = if (p.media) "media" else "link"

    walk(root, inAnchor = false)
    flushText()

    val title = titleOf(root)
    val fullText = if (meta.noIndex) "" else {
      val body = textOf(root)
      if (title.nonEmpty && body.isEmpty) title else body
    }
    ParseResult(title, fullText, spans.toSeq, meta)
  }
}
