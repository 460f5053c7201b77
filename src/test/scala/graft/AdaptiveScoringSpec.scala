package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.cli.Crawl
import graft.frontier.{CrawlConfig, UpdateDb, UpdateDbColumnar}
import graft.generate.Generator
import graft.schema.{CrawlStatus, FrontierEntry, FrontierUpdate}
import graft.score.AdaptiveScoring

/** scoring-adaptive (reference src/plugin/scoring-adaptive
  * AdaptiveScoringFilter.java — the CommonCrawl fork's production generator
  * scorer): adaptive generator sort value, last-seen stamping, per-status
  * orphan retirement. */
class AdaptiveScoringSpec extends AnyFunSuite with SparkSpecBase {

  import CrawlStatus._

  private val Now = 1700000000000L // fixed epoch ms
  private def tmp(): String = java.nio.file.Files.createTempDirectory("graft-adaptive").toString

  private def entry(url: String, status: Byte, score: Float = 1.0f,
                    fetchTime: Long = Now, retries: Int = 0,
                    meta: Map[String, String] = Map.empty): FrontierEntry = {
    val host = graft.url.Urls.hostOf(url)
    FrontierEntry(url, graft.url.Urls.hash64(url), host,
      graft.url.Urls.registeredDomainOf(host), status, fetchTime, retries,
      30 * 24 * 3600, score, null, 0L, null, -1L, meta)
  }

  test("parseSortFile: status rows, Content-Type rows, comments, malformed lines") {
    val (status, ct) = AdaptiveScoring.parseSortFile(
      """# adaptive-scoring.txt
        |db_unfetched	.1
        |db_gone	-.5
        |Content-Type:text/html	.25
        |
        |db_bogus	.3
        |db_fetched	notanumber
        |missing_tab_value
        |""".stripMargin)
    assert(status == Map(DB_UNFETCHED.toInt -> 0.1, DB_GONE.toInt -> -0.5))
    assert(ct == Map("text/html" -> 0.25))
  }

  test("sortValue column matches the reference formula branch by branch") {
    val cfg = CrawlConfig(scoringAdaptive = true,
      adaptiveStatusSort = Map(DB_GONE.toInt -> -0.5, DB_UNFETCHED.toInt -> 0.1),
      adaptiveContentTypeSort = Map("text/html" -> 0.25))
    import spark.implicits._
    val day = 86400000L
    val rows = Seq(
      // fetched, 10 days overdue: 2.0 + .01*10 = 2.1
      entry("http://a.test/1", DB_FETCHED, 2.0f, Now - 10 * day),
      // unfetched, fresh (days=0): 1.0 + status(.1) + injected boost(.2) = 1.3
      entry("http://a.test/2", DB_UNFETCHED, 1.0f, Now),
      // unfetched with 2 retries, 10 days overdue: 1 + .1(days) + .1(status) - 2*.1 = 1.0
      entry("http://a.test/3", DB_UNFETCHED, 1.0f, Now - 10 * day, retries = 2),
      // unfetched, 10 days overdue, retries 0: boost window passed → 1 + .1 + .1 = 1.2
      entry("http://a.test/4", DB_UNFETCHED, 1.0f, Now - 10 * day),
      // gone + content-type boost: 1 - .5 + .25 = 0.75
      entry("http://a.test/5", DB_GONE, 1.0f, Now,
        meta = Map("content_type" -> "text/html")),
      // fetched, last seen 40 days ago: 1 - .005*40 = 0.8
      entry("http://a.test/6", DB_FETCHED, 1.0f, Now,
        meta = Map(UpdateDb.OrphanKey -> ((Now / 1000L) - 40 * 86400L).toString))
    )
    val got = rows.toDS().toDF()
      .select(col("url"), AdaptiveScoring.sortValue(cfg, Now).as("sort"))
      .collect().map(r => r.getString(0).last -> r.getDouble(1)).toMap
    val expect = Map('1' -> 2.1, '2' -> 1.3, '3' -> 1.0, '4' -> 1.2, '5' -> 0.75, '6' -> 0.8)
    expect.foreach { case (k, v) =>
      assert(math.abs(got(k) - v) < 1e-9, s"row $k: got ${got(k)}, want $v")
    }
  }

  test("generator orders by adaptive sort value and min-score thresholds it") {
    import spark.implicits._
    val day = 86400000L
    // raw-score order is X > Y; adaptive order is Y > X (Y is 100 days overdue)
    val x = entry("http://g.test/x", DB_FETCHED, 1.0f, Now)            // sort 1.0
    val y = entry("http://g.test/y", DB_FETCHED, 0.5f, Now - 100 * day) // sort 1.5
    val cfg = CrawlConfig(scoringAdaptive = true, topN = 1, numFetchPartitions = 1)
    val (tasks, _) = Generator.generate(Seq(x, y).toDS(), cfg, Now, 1)
    assert(tasks.collect().map(_.url).toSeq == Seq("http://g.test/y"))
    // min-score applies to the SORT value: 1.2 keeps Y (1.5), drops X (1.0)
    val cfg2 = cfg.copy(minScore = 1.2f, topN = 10)
    val kept = Generator.generate(Seq(x, y).toDS(), cfg2, Now, 1)._1.collect().map(_.url)
    assert(kept.toSeq == Seq("http://g.test/y"))
  }

  test("per-status orphan retirement: typed and columnar twins agree with the decision tree") {
    import spark.implicits._
    val nowSec = Now / 1000L
    val monthSec = 60L * 24 * 30 * 60 // reference span unit: minutes→sec
    def seen(monthsAgo: Long) =
      Map(UpdateDb.OrphanKey -> (nowSec - monthsAgo * monthSec).toString)
    val rows = Seq(
      entry("http://o.test/any", DB_FETCHED, meta = seen(13)),          // > any(12mo) → orphan
      entry("http://o.test/fetched5", DB_FETCHED, meta = seen(5)),      // fetched, only any-span applies → keep
      entry("http://o.test/redir5", DB_REDIR_TEMP, meta = seen(5)),     // > redirect(4mo) → orphan
      entry("http://o.test/redir3", DB_REDIR_PERM, meta = seen(3)),     // within redirect span → keep
      entry("http://o.test/gone5", DB_GONE, meta = seen(5)),            // > gone(4mo) → orphan
      entry("http://o.test/dup5", DB_DUPLICATE, meta = seen(5)),        // duplicate = gone class → orphan
      entry("http://o.test/unf_r3", DB_UNFETCHED, retries = 3, meta = seen(5)), // retries≥3 = gone class → orphan
      entry("http://o.test/unf5", DB_UNFETCHED, meta = seen(5)),        // within unfetched(=any) span → keep
      entry("http://o.test/nostamp", DB_GONE)                           // no stamp → never retired
    )
    val cfg = CrawlConfig(scoringAdaptive = true)
    val fetched = spark.emptyDataset[FrontierUpdate]
    val typed = UpdateDb.run(rows.toDS(), fetched, fetched, cfg, Now)
      .collect().map(e => e.url -> e.status).toMap
    val columnar = UpdateDbColumnar.run(rows.toDS(), fetched, fetched, cfg, Now)
      .collect().map(e => e.url -> e.status).toMap
    val expect = Map(
      "any" -> DB_ORPHAN, "fetched5" -> DB_FETCHED, "redir5" -> DB_ORPHAN,
      "redir3" -> DB_REDIR_PERM, "gone5" -> DB_ORPHAN, "dup5" -> DB_ORPHAN,
      "unf_r3" -> DB_ORPHAN, "unf5" -> DB_UNFETCHED, "nostamp" -> DB_GONE)
    expect.foreach { case (k, v) =>
      val url = s"http://o.test/$k"
      assert(typed(url) == v, s"typed: $k got ${typed(url)}, want $v")
      assert(columnar(url) == v, s"columnar: $k got ${columnar(url)}, want $v")
    }
  }

  test("inject stamps last-seen; inlinked rows refresh it through a crawl round") {
    for (columnar <- Seq(false, true)) {
      val S = "http://ad.fix.test/"
      val A = "http://ad.fix.test/a"
      val web = LinkWeb(Map(S -> Seq(A)))
      val cfg = CrawlConfig(serverDelayMs = 0, fetchLatencyMs = 0, signer = "md5",
        scoringAdaptive = true, columnarUpdateDb = columnar)
      val crawl = Crawl(spark, tmp(), cfg, web)
      import spark.implicits._
      crawl.inject(Seq(S).toDS())
      val injected = crawl.frontier.collect()
        .map(r => r.getAs[String]("url") -> r.getAs[Map[String, String]]("metadata")).toMap
      assert(injected(S).get(UpdateDb.OrphanKey).exists(_.toLong > 0),
        s"columnar=$columnar: injected seed carries the last-seen stamp")
      crawl.round()
      val after = crawl.frontier.collect()
        .map(r => r.getAs[String]("url") -> r.getAs[Map[String, String]]("metadata")).toMap
      assert(after(A).get(UpdateDb.OrphanKey).exists(_.toLong > 0),
        s"columnar=$columnar: discovered outlink is stamped seen-now")
    }
  }
}
