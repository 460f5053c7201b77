package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.cli.CrawlRound
import graft.fixtures.{SyntheticWeb, WebConfig}
import graft.frontier.{CrawlConfig, DefaultFetchSchedule, UpdateDb}
import graft.schema.{CrawlStatus, FrontierEntry, FrontierUpdate}

/** scoring-orphan plugin semantics (reference src/plugin/scoring-orphan/
  * OrphanScoringFilter.java): inlinked rows are stamped with a last-inlinked
  * time; rows unlinked past markGoneAfter go db_gone, past markOrphanAfter
  * go db_orphan, and purgeOrphans drops db_orphan rows from the frontier. */
class OrphanSpec extends AnyFunSuite with SparkSpecBase {

  private val cfg = CrawlConfig(scoringOrphan = true)
  private val sched = DefaultFetchSchedule(cfg)
  private val now = 1700000000000L
  private val nowSec = now / 1000L
  private val day = 86400L

  private def old(url: String, meta: Map[String, String]): FrontierUpdate =
    FrontierUpdate(url, "old", CrawlStatus.DB_FETCHED, now - 1000L, 0,
      cfg.fetchIntervalDefault, 1.0f, null, 0L, null, meta, -1L)
  private def link(url: String): FrontierUpdate =
    FrontierUpdate(url, "linked", CrawlStatus.DB_UNFETCHED, now, 0,
      cfg.fetchIntervalDefault, 0.5f, null, 0L, null, Map.empty, -1L)
  private def fetchOk(url: String): FrontierUpdate =
    FrontierUpdate(url, "fetch", CrawlStatus.FETCH_SUCCESS, now, 0,
      cfg.fetchIntervalDefault, 1.0f, null, 0L, null, Map.empty, -1L)

  test("inlinked row gets a fresh last-inlinked stamp") {
    val e = UpdateDb.merge("u", Iterator(old("u", Map.empty), link("u")), cfg, sched, now).get
    assert(e.metadata(UpdateDb.OrphanKey) == nowSec.toString)
    assert(e.status == CrawlStatus.DB_FETCHED) // link-only keeps old status
  }

  test("pass-through row past markGoneAfter is marked db_gone, past markOrphanAfter db_orphan") {
    val gone = UpdateDb.merge("u",
      Iterator(old("u", Map(UpdateDb.OrphanKey -> (nowSec - 35 * day).toString))), cfg, sched, now).get
    assert(gone.status == CrawlStatus.DB_GONE)
    val orphan = UpdateDb.merge("u",
      Iterator(old("u", Map(UpdateDb.OrphanKey -> (nowSec - 45 * day).toString))), cfg, sched, now).get
    assert(orphan.status == CrawlStatus.DB_ORPHAN)
    val fresh = UpdateDb.merge("u",
      Iterator(old("u", Map(UpdateDb.OrphanKey -> (nowSec - 10 * day).toString))), cfg, sched, now).get
    assert(fresh.status == CrawlStatus.DB_FETCHED)
    val unstamped = UpdateDb.merge("u", Iterator(old("u", Map.empty)), cfg, sched, now).get
    assert(unstamped.status == CrawlStatus.DB_FETCHED)
  }

  test("a fetched-but-unlinked row also ages (updateDbScore orphan branch)") {
    val e = UpdateDb.merge("u",
      Iterator(old("u", Map(UpdateDb.OrphanKey -> (nowSec - 45 * day).toString)), fetchOk("u")),
      cfg, sched, now).get
    assert(e.status == CrawlStatus.DB_ORPHAN) // orphan verdict overrides db_fetched
  }

  test("a re-inlinked stale row is rescued: stamp refreshes, no orphan verdict") {
    val e = UpdateDb.merge("u",
      Iterator(old("u", Map(UpdateDb.OrphanKey -> (nowSec - 45 * day).toString)), link("u")),
      cfg, sched, now).get
    assert(e.status == CrawlStatus.DB_FETCHED)
    assert(e.metadata(UpdateDb.OrphanKey) == nowSec.toString)
  }

  test("purgeOrphans drops db_orphan rows from the merged frontier") {
    val pcfg = cfg.copy(purgeOrphans = true)
    assert(UpdateDb.merge("u",
      Iterator(old("u", Map(UpdateDb.OrphanKey -> (nowSec - 45 * day).toString))), pcfg, sched, now).isEmpty)
    assert(UpdateDb.merge("u",
      Iterator(old("u", Map(UpdateDb.OrphanKey -> (nowSec - 45 * day).toString)), fetchOk("u")),
      pcfg, sched, now).isEmpty)
  }

  test("disabled plugin leaves rows untouched") {
    val off = CrawlConfig()
    val e = UpdateDb.merge("u",
      Iterator(old("u", Map(UpdateDb.OrphanKey -> (nowSec - 45 * day).toString)), link("u")),
      off, sched, now).get
    assert(e.status == CrawlStatus.DB_FETCHED)
    assert(e.metadata(UpdateDb.OrphanKey) == (nowSec - 45 * day).toString) // not refreshed
  }

  test("columnar ≡ typed on full crawl rounds with orphan scoring on") {
    def tmp(): String = java.nio.file.Files.createTempDirectory("graft-orph").toString
    def frontierOf(c: CrawlConfig): org.apache.spark.sql.DataFrame = {
      val web = SyntheticWeb(WebConfig(nHosts = 6, pagesPerHost = 12, hotFactor = 3))
      val (store, _) = CrawlRound.syntheticCrawl(spark, web, c, rounds = 2, tmp())
      store.load(spark, "frontier").get
        .select(col("url"), col("status"), col("score"),
          element_at(col("metadata"), UpdateDb.OrphanKey).as("orphan_stamp"))
    }
    val base = CrawlConfig(scoringOrphan = true, topN = 300, maxPerHost = 50,
      numFetchPartitions = 3, serverDelayMs = 200, fetchLatencyMs = 5)
    val typed = frontierOf(base.copy(columnarUpdateDb = false))
    val columnar = frontierOf(base.copy(columnarUpdateDb = true))
    val d1 = typed.exceptAll(columnar).collect()
    val d2 = columnar.exceptAll(typed).collect()
    assert(d1.isEmpty && d2.isEmpty,
      s"typed-only:\n${d1.take(5).mkString("\n")}\ncolumnar-only:\n${d2.take(5).mkString("\n")}")
    // every frontier row in an orphan-scoring crawl is either stamped (was
    // inlinked at some round) or a seed that has never been linked
    val stamped = columnar.filter(col("orphan_stamp").isNotNull).count()
    assert(stamped > 0)
  }
}
