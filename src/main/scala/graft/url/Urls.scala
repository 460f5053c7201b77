package graft.url

import java.util.Locale

/** URL canonicalization, host/domain extraction and hashing.
  *
  * Semantics (not code) derived from the reference normalizer chain:
  *  - basic normalizer: lowercase scheme+host, strip default port, strip
  *    fragment, empty path → "/", resolve "/./", "/../", "//", RFC-3986
  *    percent-encoding normalization
  *    (reference/src/plugin/urlnormalizer-basic/.../BasicURLNormalizer.java:168-277)
  *  - regex normalizer defaults: strip session-id query params, collapse
  *    "?&", "&&", trailing "?"/"&", duplicate slashes
  *    (reference/conf/regex-normalize.xml.template)
  *
  * This canonical form defines the URL-seen set key (north rule:
  * canonical URL → 64-bit hash), so it must be deterministic and idempotent:
  * canonicalize(canonicalize(u)) == canonicalize(u).
  *
  * All functions are pure, static, null-safe and exception-free so they can
  * be called from codegen'd Catalyst expressions (StaticInvoke) on executors.
  */
object Urls {

  // file has no default port (-1 never matches an explicit port)
  private val DefaultPorts = Map("http" -> 80, "https" -> 443, "ftp" -> 21, "file" -> -1)

  /** Query parameter names treated as session ids and stripped
    * (reference regex-normalize defaults). */
  private val SessionParams =
    Set("sid", "phpsessid", "sessionid", "session_id", "jsessionid", "bv_sessionid", "bv_engineid")

  private val Unreserved: Array[Boolean] = {
    val a = new Array[Boolean](128)
    for (c <- 'a' to 'z') a(c) = true
    for (c <- 'A' to 'Z') a(c) = true
    for (c <- '0' to '9') a(c) = true
    for (c <- Seq('-', '.', '_', '~')) a(c) = true
    a
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  /** Canonicalize a URL string; returns null for unparseable/unsupported URLs
    * (callers filter nulls, mirroring the reference filter chain's null ⇒ drop). */
  def canonicalize(raw: String): String = {
    if (raw == null) return null
    val trimmed = raw.trim
    if (trimmed.isEmpty) return null
    try {
      // --- split scheme ---
      val schemeEnd = trimmed.indexOf("://")
      if (schemeEnd <= 0) return null
      val scheme = trimmed.substring(0, schemeEnd).toLowerCase(Locale.ROOT)
      if (!DefaultPorts.contains(scheme)) return null // file:/ftp handled; mailto etc dropped by filter anyway
      var rest = trimmed.substring(schemeEnd + 3)

      // --- strip fragment ---
      val hashIdx = rest.indexOf('#')
      if (hashIdx >= 0) rest = rest.substring(0, hashIdx)
      if (rest.isEmpty) return null

      // --- split authority / path+query ---
      val slashIdx = rest.indexOf('/')
      val qIdxA = rest.indexOf('?')
      val authEnd =
        if (slashIdx < 0 && qIdxA < 0) rest.length
        else if (slashIdx < 0) qIdxA
        else if (qIdxA < 0) slashIdx
        else math.min(slashIdx, qIdxA)
      var authority = rest.substring(0, authEnd)
      var pathQuery = rest.substring(authEnd)
      if (pathQuery.isEmpty || pathQuery.startsWith("?")) pathQuery = "/" + pathQuery

      // --- userinfo (kept verbatim, rare) ---
      var userinfo = ""
      val atIdx = authority.lastIndexOf('@')
      if (atIdx >= 0) {
        userinfo = authority.substring(0, atIdx + 1)
        authority = authority.substring(atIdx + 1)
      }

      // --- host[:port] ---
      var host = authority
      var port = -1
      val colonIdx = authority.lastIndexOf(':')
      if (colonIdx >= 0 && authority.indexOf(']') < colonIdx) { // respects [ipv6]:port
        val p = authority.substring(colonIdx + 1)
        if (p.nonEmpty && p.forall(_.isDigit)) {
          port = p.toInt
          host = authority.substring(0, colonIdx)
        } else if (p.isEmpty) {
          host = authority.substring(0, colonIdx) // "host:" → drop empty port
        }
      }
      host = host.toLowerCase(Locale.ROOT)
      while (host.endsWith(".")) host = host.substring(0, host.length - 1) // trailing-dot rule
      // RFC 8089: a file URL's empty authority means localhost — keep the
      // canonical form hosted so host-keyed politeness/partitioning works
      if (host.isEmpty && scheme == "file") host = "localhost"
      if (host.isEmpty) return null
      val portPart =
        if (port < 0 || port == DefaultPorts(scheme)) "" else ":" + port

      // --- path + query ---
      val qIdx = pathQuery.indexOf('?')
      var path = if (qIdx < 0) pathQuery else pathQuery.substring(0, qIdx)
      var query = if (qIdx < 0) null else pathQuery.substring(qIdx + 1)

      path = normalizeEscapes(path, isQuery = false)
      path = resolveDots(path)
      if (path.isEmpty) path = "/"

      if (query != null) {
        query = normalizeQuery(query)
      }

      val sb = new StringBuilder(trimmed.length)
      sb.append(scheme).append("://").append(userinfo).append(host).append(portPart).append(path)
      if (query != null && query.nonEmpty) sb.append('?').append(query)
      sb.toString
    } catch {
      case _: Exception => null
    }
  }

  /** RFC-3986 percent-encoding normalization: decode unreserved characters,
    * uppercase the hex of remaining escapes, escape bare characters that must
    * be escaped (space, control, non-ASCII). */
  private[url] def normalizeEscapes(s: String, isQuery: Boolean): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length && isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        val v = Integer.parseInt(s.substring(i + 1, i + 3), 16)
        if (v < 128 && Unreserved(v)) sb.append(v.toChar)
        else sb.append('%').append(Character.toUpperCase(s.charAt(i + 1))).append(Character.toUpperCase(s.charAt(i + 2)))
        i += 3
      } else if (c <= ' ' || c >= 127) {
        // escape spaces, control chars, non-ASCII as the UTF-8 bytes of the
        // FULL code point: a high+low surrogate pair (emoji etc.) is encoded
        // together — encoding the chars separately would produce unpaired
        // surrogates that the UTF-8 encoder replaces with '?', colliding
        // distinct URLs in the URL-seen key
        val cp =
          if (Character.isHighSurrogate(c) && i + 1 < s.length && Character.isLowSurrogate(s.charAt(i + 1)))
            new String(Array(c, s.charAt(i + 1)))
          else c.toString
        for (b <- cp.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          sb.append('%').append(f"${b & 0xff}%02X")
        i += cp.length
      } else {
        sb.append(c)
        i += 1
      }
    }
    sb.toString
  }

  /** Resolve /./ , /../ and collapse duplicate slashes; leading path only. */
  private[url] def resolveDots(path: String): String = {
    val segs = path.split("/", -1)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < segs.length) {
      val s = segs(i)
      s match {
        case "" | "."       => // collapse // and /./
        case ".."           => if (out.nonEmpty) out.remove(out.length - 1)
        case other          => out += other
      }
      i += 1
    }
    val trailingSlash = path.endsWith("/") || path.endsWith("/.") || path.endsWith("/..")
    val joined = "/" + out.mkString("/")
    if (trailingSlash && joined != "/") joined + "/" else joined
  }

  /** Normalize the query: drop session-id params, drop empty params,
    * normalize escapes, keep parameter order (reference keeps order). */
  private[url] def normalizeQuery(q: String): String = {
    if (q.isEmpty) return ""
    val parts = q.split("&").iterator
      .map(_.trim)
      .filter(_.nonEmpty)
      .filter { p =>
        val eq = p.indexOf('=')
        val key = (if (eq < 0) p else p.substring(0, eq)).toLowerCase(Locale.ROOT)
        !SessionParams.contains(key)
      }
      .map(p => normalizeEscapes(p, isQuery = true))
      .toSeq
    parts.mkString("&")
  }

  /** Lowercase host of a URL; null-safe. */
  def hostOf(url: String): String = {
    if (url == null) return null
    val i = url.indexOf("://")
    if (i < 0) return null
    var rest = url.substring(i + 3)
    val end = rest.indexWhere(c => c == '/' || c == '?' || c == '#')
    if (end >= 0) rest = rest.substring(0, end)
    val at = rest.lastIndexOf('@')
    if (at >= 0) rest = rest.substring(at + 1)
    val colon = rest.lastIndexOf(':')
    if (colon >= 0 && rest.indexOf(']') < colon && rest.substring(colon + 1).forall(_.isDigit))
      rest = rest.substring(0, colon)
    val h = rest.toLowerCase(Locale.ROOT)
    if (h.isEmpty) null else h
  }

  /** Registered domain (one label below the public suffix) — full PSL rule
    * semantics (wildcards, exceptions, private suffixes) via [[PublicSuffix]];
    * the reference uses crawler-commons EffectiveTldFinder for the same
    * purpose (URLPartitioner.java:105-107). Wrong suffix handling here means
    * wrong per-domain caps and dedup keys (e.g. all of *.github.io collapsing
    * into one "domain"). */
  def registeredDomainOf(host: String): String = PublicSuffix.registeredDomainOf(host)

  /** Explicit port in a URL's authority, or -1 when absent/unparseable. */
  def portOf(url: String): Int = {
    if (url == null) return -1
    val i = url.indexOf("://")
    if (i < 0) return -1
    var rest = url.substring(i + 3)
    val end = rest.indexWhere(c => c == '/' || c == '?' || c == '#')
    if (end >= 0) rest = rest.substring(0, end)
    val at = rest.lastIndexOf('@')
    if (at >= 0) rest = rest.substring(at + 1)
    val colon = rest.lastIndexOf(':')
    if (colon < 0 || rest.indexOf(']') >= colon) return -1
    val p = rest.substring(colon + 1)
    if (p.nonEmpty && p.length <= 5 && p.forall(_.isDigit)) p.toInt else -1
  }

  /** Path + query of a URL ("/" if none) — the portion robots.txt rules
    * match against (crawler-commons matches path+query too). */
  def pathQueryOf(url: String): String = {
    if (url == null) return "/"
    val i = url.indexOf("://")
    if (i < 0) return "/"
    val rest = url.substring(i + 3)
    val slash = rest.indexOf('/')
    val q = rest.indexOf('?')
    if (slash < 0 && q < 0) "/"
    else if (slash < 0) "/" + rest.substring(q)
    else if (q >= 0 && q < slash) "/" + rest.substring(q)
    else rest.substring(slash)
  }

  /** Reversed host for storage locality: www.example.com → com.example.www. */
  def reverseHost(host: String): String =
    if (host == null) null else host.split('.').reverse.mkString(".")

  /** Position-weighted URL hash used to interleave same-host URLs within a
    * fetch partition (politeness spread). Same recurrence shape as the
    * reference's HashComparator (reference/src/java/org/apache/nutch/crawl/Generator.java:635-642):
    * bytes folded right-to-left with h = 31*h + b. */
  def interleaveHash(url: String): Int = {
    if (url == null) return 0
    var h = 0
    val bytes = url.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = bytes.length - 1
    while (i >= 0) {
      h = 31 * h + bytes(i)
      i -= 1
    }
    h
  }

  /** Representative-URL election after a redirect. Semantics follow the
    * reference's URLUtil.chooseRepr behaviors (util/URLUtil.java, used at
    * fetcher/FetcherThread.java:614): a permanent redirect makes the
    * destination representative; a temporary redirect keeps the source,
    * unless the destination is the https twin or strictly shorter on the
    * same host (vanity → canonical). */
  def chooseRepr(src: String, dst: String, temp: Boolean): String = {
    if (dst == null) return src
    if (src == null) return dst
    if (!temp) return dst
    val sh = hostOf(src)
    val dh = hostOf(dst)
    if (sh != null && sh == dh) {
      val httpsTwin = dst.startsWith("https://") && src.startsWith("http://") &&
        dst.substring(8) == src.substring(7)
      if (httpsTwin || dst.length < src.length) dst else src
    } else src
  }

  /** 64-bit URL-seen hash of the canonical URL: MurmurHash2 64-bit.
    * STABILITY CONTRACT: this is the URL-seen set key (north rule:
    * canonicalized URL → 64-bit hash) and the frontier bucketing key — its
    * value must NEVER change across releases. Do not "upgrade" the algorithm
    * (e.g. to Murmur3): that would invalidate every stored url_hash, bloom
    * filter and bucketed layout. */
  def hash64(s: String): Long = {
    if (s == null) return 0L
    val data = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    murmur64(data, data.length, 0x9747b28cL)
  }

  /** SURT-form CDX urlkey ("Sort-friendly URI Reordering Transform" — the
    * reference's WarcCdxWriter urlkey column,
    * reference/src/java/org/commoncrawl/util/WarcCdxWriter.java): scheme
    * dropped, host lowercased with a leading "www." stripped and its
    * segments reversed comma-joined, then ")" + lowercased path, query
    * parameters sorted — so captures of one page cluster under one key and
    * a sorted CDX file range-scans by site. Null for unparseable URLs. */
  def surt(url: String): String = {
    val host0 = hostOf(url)
    if (host0 == null) return null
    var host = host0.toLowerCase(Locale.ROOT)
    if (host.startsWith("www.") && host.length > 4) host = host.substring(4)
    // non-default ports stay in the urlkey (reference SURT keeps them):
    // host:8080 and host must not collide under one CDX key
    val scheme = url.substring(0, url.indexOf("://")).toLowerCase(Locale.ROOT)
    val defaultPort = scheme match {
      case "http" => 80; case "https" => 443; case "ftp" => 21; case _ => -1
    }
    val port = portOf(url)
    val portSuffix = if (port > 0 && port != defaultPort) ":" + port else ""
    val revHost = host.split('.').reverse.mkString(",") + portSuffix
    val pq = pathQueryOf(url).toLowerCase(Locale.ROOT)
    val qi = pq.indexOf('?')
    val path = if (qi >= 0) pq.substring(0, qi) else pq
    val query =
      if (qi < 0 || qi == pq.length - 1) ""
      else "?" + pq.substring(qi + 1).split('&').sorted.mkString("&")
    revHost + ")" + (if (path.isEmpty) "/" else path) + query
  }

  /** 64-bit rolling hash over characters (h = 31*h + c): the classic
    * polynomial fingerprint, one pass, allocation-free. */
  def rollingHash64(s: String): Long = {
    if (s == null) return 0L
    var h = 1125899906842597L // large prime seed
    var i = 0
    while (i < s.length) {
      h = 31 * h + s.charAt(i)
      i += 1
    }
    h
  }

  /** MurmurHash2 64-bit (public-domain algorithm, Austin Appleby). */
  private def murmur64(data: Array[Byte], length: Int, seed: Long): Long = {
    val m = 0xc6a4a7935bd1e995L
    val r = 47
    var h = seed ^ (length * m)
    val nblocks = length / 8
    var i = 0
    while (i < nblocks) {
      val base = i * 8
      var k = 0L
      var j = 0
      while (j < 8) {
        k |= (data(base + j) & 0xffL) << (8 * j)
        j += 1
      }
      k *= m; k ^= k >>> r; k *= m
      h ^= k; h *= m
      i += 1
    }
    val tail = nblocks * 8
    var rem = length & 7
    while (rem > 0) {
      rem -= 1
      h ^= (data(tail + rem) & 0xffL) << (8 * rem)
      if (rem == 0) h *= m
    }
    h ^= h >>> r; h *= m; h ^= h >>> r
    h
  }
}
