package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.fetch.{HttpFetcher, Robots}
import graft.frontier.CrawlConfig
import graft.schema.CrawlStatus

/** The real HTTP protocol fetcher against an in-process HTTP server:
  * status→code mapping, robots handling (HttpRobotRulesParser semantics),
  * and the reference's politeness-budget e2e
  * (reference/src/test/org/apache/nutch/fetcher/TestFetcher.java:84-187 —
  * wall-time must exceed the politeness budget and the fetched set must be
  * exactly the allowed pages). */
class HttpFetcherSpec extends AnyFunSuite with SparkSpecBase with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var port: Int = _
  /** (path, epoch-ms) of every request the server saw. */
  private val hits = new ConcurrentLinkedQueue[(String, Long)]()

  private def respond(ex: HttpExchange, code: Int, body: String = null,
                      contentType: String = "text/html",
                      headers: Map[String, String] = Map.empty): Unit = {
    headers.foreach { case (k, v) => ex.getResponseHeaders.set(k, v) }
    if (body == null) {
      ex.sendResponseHeaders(code, -1)
    } else {
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", contentType)
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
    }
    ex.close()
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      val path = ex.getRequestURI.getPath
      hits.add((path, System.currentTimeMillis()))
      path match {
        case "/robots.txt" =>
          respond(ex, 200,
            "User-agent: *\nDisallow: /private/\nCrawl-delay: 1\n", "text/plain")
        case p if p.matches("/p[0-9]") =>
          val n = p.last.asDigit
          respond(ex, 200,
            s"""<html><body>page $n <a href="/p${(n % 4) + 1}">next</a>
               |<a href="/extra$n">more</a></body></html>""".stripMargin,
            "text/html; charset=utf-8")
        case "/private/x" => respond(ex, 200, "<html><body>secret</body></html>")
        case "/missing"   => respond(ex, 404)
        case "/boom"      => respond(ex, 500, "oops", "text/plain")
        case "/redir"     => respond(ex, 301, headers = Map("Location" -> "/p2"))
        case "/tmpredir"  => respond(ex, 302, headers = Map("Location" -> s"http://127.0.0.1:$port/p3"))
        case "/notmod"    => respond(ex, 304)
        case "/denied"    => respond(ex, 403)
        case "/throttle"  => respond(ex, 429, "slow down", "text/plain")
        case "/lyingpdf"  => respond(ex, 200, "%PDF-1.4 not actually html", "text/html")
        case "/badloc"    => respond(ex, 302, headers = Map("Location" -> "/search?q=foo bar"))
        case "/latin1" =>
          // charset-labelled non-UTF-8 page: bytes are ISO-8859-1 (0xE9 é)
          val bytes = "<html><body>café menú</body></html>"
            .getBytes(java.nio.charset.Charset.forName("ISO-8859-1"))
          ex.getResponseHeaders.set("Content-Type", "text/html; charset=ISO-8859-1")
          ex.sendResponseHeaders(200, bytes.length)
          ex.getResponseBody.write(bytes)
          ex.close()
        case _            => respond(ex, 404)
      }
    })
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    server.start()
    port = server.getAddress.getPort
  }

  override def afterAll(): Unit = {
    try server.stop(0) finally super.afterAll()
  }

  private def url(path: String): String = s"http://127.0.0.1:$port$path"
  private def fetcher = HttpFetcher(robotsPortOverride = port)

  test("charset-labelled response: header charset drives the parse decode (e2e)") {
    val resp = fetcher.fetch(url("/latin1"))
    assert(resp.code == "SUCCESS")
    assert(resp.contentType == "text/html; charset=ISO-8859-1")
    val spans = graft.parse.DocParsers.parseSpans(resp.contentType, url("/latin1"),
      resp.content, CrawlConfig())
    val text = spans.filter(_.kind == "text").map(_.text).mkString(" ")
    assert(text.contains("café") && text.contains("menú"),
      s"ISO-8859-1 body must decode via the header charset, got: $text")
  }

  test("HTTP status mapping to protocol codes (ProtocolStatus semantics)") {
    val f = fetcher
    val ok = f.fetch(url("/p1"))
    assert(ok.code == "SUCCESS")
    assert(new String(ok.content, "UTF-8").contains("page 1"))
    assert(ok.contentType.startsWith("text/html"))
    assert(ok.latencyMs >= 0)

    val moved = f.fetch(url("/redir"))
    assert(moved.code == "MOVED")
    assert(moved.redirectTo == url("/p2"), "relative Location must resolve against the request")
    assert(f.fetch(url("/tmpredir")).code == "TEMP_MOVED")
    assert(f.fetch(url("/tmpredir")).redirectTo == url("/p3"))
    assert(f.fetch(url("/missing")).code == "NOTFOUND")
    assert(f.fetch(url("/notmod")).code == "NOTMODIFIED")
    assert(f.fetch(url("/denied")).code == "GONE")
    assert(f.fetch(url("/boom")).code == "RETRY")
    assert(f.fetch(url("/throttle")).code == "RETRY")
    // connection refused (no listener) → transient RETRY
    val dead = HttpFetcher(connectTimeoutMs = 500).fetch("http://127.0.0.1:1/x")
    assert(dead.code == "RETRY")
    // malformed Location (unencoded space) degrades to a recorded redirect
    // with a null target — never a permanent NOTFOUND
    val bad = f.fetch(url("/badloc"))
    assert(bad.code == "TEMP_MOVED" && bad.redirectTo == null, s"$bad")
  }

  test("robots.txt follows redirects (the http→https bounce must not defer forever)") {
    val target = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    target.createContext("/", (ex: HttpExchange) =>
      respond(ex, 200, "User-agent: *\nDisallow: /secret/\n", "text/plain"))
    target.start()
    val front = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    front.createContext("/", (ex: HttpExchange) => respond(ex, 301, headers =
      Map("Location" -> s"http://127.0.0.1:${target.getAddress.getPort}/robots.txt")))
    front.start()
    try {
      val rules = HttpFetcher(robotsPortOverride = front.getAddress.getPort)
        .robotsRules("127.0.0.1")
      assert(rules.isDefined, "redirected robots must resolve, not defer")
      assert(!rules.get.isAllowed("/secret/x") && rules.get.isAllowed("/ok"))
    } finally { front.stop(0); target.stop(0) }
  }

  test("content truncation guard cuts oversized bodies without dropping the fetch") {
    val f = HttpFetcher(robotsPortOverride = port, maxContentBytes = 10)
    val r = f.fetch(url("/p1"))
    assert(r.code == "SUCCESS" && r.content.length == 10)
  }

  test("robots handling: parse on 200, allow on 404, deny on 403, defer on 5xx") {
    val rules = fetcher.robotsRules("127.0.0.1").get
    assert(rules.crawlDelay.contains(1.0))
    assert(!rules.isAllowed("/private/x") && rules.isAllowed("/p1"))

    def oneShot(code: Int)(check: Option[Robots.RobotRules] => Unit): Unit = {
      val s = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
      s.createContext("/", (ex: HttpExchange) => respond(ex, code,
        if (code == 200) "User-agent: *\nDisallow:\n" else null, "text/plain"))
      s.start()
      try check(HttpFetcher(robotsPortOverride = s.getAddress.getPort).robotsRules("127.0.0.1"))
      finally s.stop(0)
    }
    oneShot(404)(r => assert(r.contains(Robots.AllowAll)))
    oneShot(403)(r => assert(r.exists(_.deniesAll), "403 robots must deny all by default"))
    oneShot(500)(r => assert(r.isEmpty, "5xx robots must defer visits"))
    // http.robots.403.allow flips the 403 policy
    val s = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    s.createContext("/", (ex: HttpExchange) => respond(ex, 403))
    s.start()
    try assert(HttpFetcher(robotsPortOverride = s.getAddress.getPort, http403AllowsAll = true)
      .robotsRules("127.0.0.1").contains(Robots.AllowAll))
    finally s.stop(0)
  }

  test("politeness-budget e2e: crawl round over real HTTP honors Crawl-delay; fetched set exact") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-http").toString
    // md5 signer: the fixture pages are tiny and TextProfile would quantize
    // them into one dedup signature (its designed behavior for near-empty
    // docs); exact signatures keep the dedup stage out of this test's way
    val cfg = CrawlConfig(topN = 100, maxPerHost = 100, numFetchPartitions = 1,
      realClock = true, serverDelayMs = 50, signer = "md5")
    val crawl = graft.cli.Crawl(spark, root, cfg, fetcher)
    val seeds = Seq("/p1", "/p2", "/p3", "/p4", "/private/x", "/missing").map(url)
    crawl.inject(seeds.toDS())
    hits.clear()
    val stats = crawl.round()

    val rows = crawl.frontier.collect()
      .map(r => r.getAs[String]("url") -> r.getAs[Byte]("status")).toMap
    // fetched set equality (TestFetcher's second assertion): the four pages
    // succeed, the robots-denied path and the 404 go gone — all six resolve
    (1 to 4).foreach(n => assert(rows(url(s"/p$n")) == CrawlStatus.DB_FETCHED,
      s"/p$n must fetch over real HTTP: got ${rows.get(url(s"/p$n"))}"))
    assert(rows(url("/private/x")) == CrawlStatus.DB_GONE, "robots path rule must deny /private/")
    assert(rows(url("/missing")) == CrawlStatus.DB_GONE)
    assert(stats.fetchedPages == 6, "all six generated URLs must resolve in the round")
    assert(crawl.fetched(1).get.filter(
      org.apache.spark.sql.functions.col("protocol_status") === "SUCCESS").count() == 4)

    // the server never saw the denied path (gate enforced BEFORE request)
    val seenPaths = hits.toArray.map(_.asInstanceOf[(String, Long)]._1).toSet
    assert(!seenPaths.contains("/private/x"))

    // politeness budget (TestFetcher's first assertion): 5 requests on one
    // host (4 pages + 404; robots.txt exempt) with Crawl-delay 1 ⇒ the
    // request span must exceed (n-1) × delay
    val pageTimes = hits.toArray.map(_.asInstanceOf[(String, Long)])
      .filter(_._1 != "/robots.txt").map(_._2).sorted
    assert(pageTimes.length == 5, s"expected 5 page requests, saw $seenPaths")
    val span = pageTimes.last - pageTimes.head
    assert(span >= 4 * 1000 - 200,
      s"politeness budget violated: 5 fetches spanned only ${span}ms (delay 1000ms)")
    // consecutive same-host requests respect the delay (small scheduling slack)
    pageTimes.sliding(2).foreach { case Array(a, b) =>
      assert(b - a >= 800, s"consecutive fetches ${b - a}ms apart (< crawl-delay)")
    }

    // discovered outlinks entered the frontier via the REAL html parse path
    assert(rows.size > seeds.size, "parsed outlinks must extend the frontier")
  }

  test("content-magic sniffing rides the real protocol path (lying header)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-http2").toString
    val cfg = CrawlConfig(topN = 10, maxPerHost = 10, numFetchPartitions = 1,
      realClock = true, serverDelayMs = 10)
    val crawl = graft.cli.Crawl(spark, root, cfg, fetcher)
    crawl.inject(Seq(url("/lyingpdf")).toDS())
    crawl.round()
    val spans = crawl.parsed(1).get.selectExpr("explode(spans) as s").select("s.kind")
      .collect().map(_.getString(0)).toSeq
    assert(spans == Seq("media"),
      s"a %PDF body served as text/html must dispatch as binary, got $spans")
  }
}
