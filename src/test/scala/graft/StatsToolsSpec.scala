package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.frontier._
import graft.schema.{CrawlStatus, FrontierEntry}
import graft.url.Urls

/** CrawlCompletionStats + ProtocolStatusStatistics + FreeGenerator
  * (reference util/CrawlCompletionStats.java, util/ProtocolStatusStatistics
  * .java, tools/FreeGenerator.java) and the protocol-status → crawldb
  * stamping that feeds the second tool. */
class StatsToolsSpec extends AnyFunSuite with SparkSpecBase {

  val now = 1700000000000L
  def entry(url: String, status: Byte, md: Map[String, String] = Map.empty): FrontierEntry = {
    val host = Urls.hostOf(url)
    FrontierEntry(url, Urls.hash64(url), host, Urls.registeredDomainOf(host),
      status, now, 0, 2592000, 1f, null, 0L, null, -1L, md)
  }

  test("crawlCompletionStats: fetched|notmodified count FETCHED, everything else UNFETCHED") {
    import spark.implicits._
    val db = Seq(
      entry("http://a.example.com/1", CrawlStatus.DB_FETCHED),
      entry("http://a.example.com/2", CrawlStatus.DB_NOTMODIFIED),
      entry("http://a.example.com/3", CrawlStatus.DB_UNFETCHED),
      entry("http://b.example.org/1", CrawlStatus.DB_GONE),
      entry("http://b.example.org/2", CrawlStatus.DB_REDIR_TEMP),
      entry("http://c.example.org/1", CrawlStatus.DB_FETCHED)).toDS()

    val byHost = FrontierTools.crawlCompletionStats(db, "host").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(byHost == Map(
      ("a.example.com", "FETCHED") -> 2L, ("a.example.com", "UNFETCHED") -> 1L,
      ("b.example.org", "UNFETCHED") -> 2L, ("c.example.org", "FETCHED") -> 1L))

    val byDomain = FrontierTools.crawlCompletionStats(db, "domain").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(byDomain == Map(
      ("example.com", "FETCHED") -> 2L, ("example.com", "UNFETCHED") -> 1L,
      ("example.org", "FETCHED") -> 1L, ("example.org", "UNFETCHED") -> 2L))
  }

  test("protocolStatusStats: counts stamped statuses, UNFETCHED when never fetched") {
    import spark.implicits._
    val k = FrontierTools.ProtocolStatusKey
    val db = Seq(
      entry("http://a.example.com/1", CrawlStatus.DB_FETCHED, Map(k -> "SUCCESS")),
      entry("http://a.example.com/2", CrawlStatus.DB_FETCHED, Map(k -> "SUCCESS")),
      entry("http://a.example.com/3", CrawlStatus.DB_GONE, Map(k -> "NOTFOUND")),
      entry("http://a.example.com/4", CrawlStatus.DB_UNFETCHED),
      entry("http://a.example.com/5", CrawlStatus.DB_UNFETCHED, Map("other" -> "x"))).toDS()
    val stats = FrontierTools.protocolStatusStats(db).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats == Map("SUCCESS" -> 2L, "NOTFOUND" -> 1L, "UNFETCHED" -> 2L))
  }

  test("fetchUpdates stamps protocol status into metadata when protocolStatusToCrawlDb=true") {
    import spark.implicits._
    val page = graft.fetch.FetchedPage("http://a.example.com/", Urls.hash64("http://a.example.com/"),
      "a.example.com", CrawlStatus.FETCH_GONE, "NOTFOUND", now, "text/html", null, null,
      0, 2592000, 1f, 1, Seq.empty)
    val off = graft.parse.Parse.fetchUpdates(Seq(page).toDS(), CrawlConfig()).collect().head
    assert(off.metadata.isEmpty, "hot path ships no metadata map by default")
    val on = graft.parse.Parse.fetchUpdates(Seq(page).toDS(),
      CrawlConfig(protocolStatusToCrawlDb = true)).collect().head
    assert(on.metadata == Map(FrontierTools.ProtocolStatusKey -> "NOTFOUND"))
  }

  test("freeGenerate: normalize, filter, dedup, host-sticky partitioning") {
    import spark.implicits._
    val lines = Seq(
      "HTTP://A.Example.COM:80/page",     // canonicalizes
      "http://a.example.com/page",        // duplicate after canonicalization
      "  http://b.example.com/x  ",       // trimmed
      "# comment",
      "",
      "http://c.example.com/img.jpg",     // media suffix filtered
      "mailto:x@example.com",             // scheme filtered
      "http://d.example.com/a/a/a/x"      // path-loop trap filtered
    ).toDS()
    val tasks = FrontierTools.freeGenerate(lines, CrawlConfig(), now).collect()
    assert(tasks.map(_.url).sorted.toSeq ==
      Seq("http://a.example.com/page", "http://b.example.com/x"))
    val t = tasks.find(_.url == "http://a.example.com/page").get
    assert(t.status == CrawlStatus.DB_UNFETCHED && t.score == 1f &&
      t.fetch_interval == CrawlConfig().fetchIntervalDefault && t.fetch_time == now)

    // unfiltered mode keeps the media suffix but still drops comments
    val unfiltered = FrontierTools.freeGenerate(lines, CrawlConfig(), now, filter = false).collect()
    assert(unfiltered.map(_.url).contains("http://c.example.com/img.jpg"))

    // host-sticky: every task of one host lands in one partition
    val many = (for (h <- 1 to 6; p <- 1 to 30) yield s"http://h$h.example.com/p$p").toDS()
    val parts = FrontierTools.freeGenerate(many, CrawlConfig(numFetchPartitions = 4), now)
      .mapPartitions(it => Iterator.single(it.map(_.host).toSet.toSeq))
      .collect()
    val hostToParts = parts.zipWithIndex.flatMap { case (hs, i) => hs.map(_ -> i) }
      .groupBy(_._1).map { case (h, xs) => h -> xs.map(_._2).distinct.size }
    assert(hostToParts.values.forall(_ == 1), s"host split across partitions: $hostToParts")
  }
}
