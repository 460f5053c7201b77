package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.url.ValidatorUrlFilter

/** urlfilter-validator (reference src/plugin/urlfilter-validator
  * UrlValidator.java): RFC 2396 syntax validation. The accept/reject cases
  * mirror the reference's own TestUrlValidator goldens plus the individual
  * rule branches. */
class UrlValidatorSpec extends AnyFunSuite {

  private def ok(u: String) = assert(ValidatorUrlFilter.accept(u), s"should accept: $u")
  private def no(u: String) = assert(!ValidatorUrlFilter.accept(u), s"should reject: $u")

  test("reference TestUrlValidator goldens") {
    no(null)
    no("example.com/file[/].html")                       // no scheme, illegal path chars
    no("http://www.example.com/space here.html")         // whitespace
    no("/main.html")                                     // no scheme/authority
    no("www.example.com/main.html")                      // no scheme
    no("ftp:www.example.com/main.html")                  // scheme but no authority
    no("http://999.000.456.32/nutch/trunk/README.txt")   // IPv4 octet > 255
    no(" http://www.example.com/ma|in\\toc.html")        // leading space + | \
    ok("https://issues.apache.org/jira/NUTCH-1127")
    ok("http://domain.tld/function.cgi?url=http://fonzi.com/&amp;name=Fonzi&amp;mood=happy&amp;coat=leather")
    ok("http://validator.w3.org/feed/check.cgi?url=http%3A%2F%2Ffeeds.feedburner.com%2Fperishablepress")
    ok("ftp://alfa.bravo.pi/mike/check/plan.pdf")
  }

  test("rule branches: scheme, authority, port, TLD, path traversal") {
    no("h9p://example.com/")                // scheme must be letters only
    ok("http://192.168.1.254/x")            // valid IPv4
    no("http://example.com:d90/")           // non-numeric port → extra garbage
    ok("http://example.com:8080/")          // numeric port
    no("http://example.com:123456/")        // port > 5 digits
    no("http://example/")                   // single label host
    no("http://example.7com/")              // TLD starts with a digit
    no("http://example.c/")                 // TLD too short
    no("http://exa mple.com/")              // space in authority
    ok("http://a.example.com/a/b/../c/../d") // 5 slashes - 1 > 2 dotdots
    no("http://a.example.com/a/../../..")    // traversal outnumbers segments
    no("http://example.com/päge")            // non-ASCII
  }
}
