package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.cli.CrawlRound
import graft.fixtures.{SyntheticWeb, WebConfig}
import graft.frontier.CrawlConfig
import graft.store.{IcebergStore, SnapshotStore, TableStore}

/** The Iceberg-format TableStore: the full crawl loop must be
  * store-agnostic (differential vs the manifest store), resume and
  * rollback must work from the snapshot log, and the metadata layout must
  * be the Iceberg shape (immutable vN.metadata.json chain + version-hint). */
class IcebergStoreSpec extends AnyFunSuite with SparkSpecBase {

  def tmp(): String = java.nio.file.Files.createTempDirectory("graft-iceberg").toString

  val web = SyntheticWeb(WebConfig(nHosts = 8, pagesPerHost = 12, hotFactor = 4))
  val cfg = CrawlConfig(topN = 300, maxPerHost = 40, numFetchPartitions = 4,
    serverDelayMs = 500, fetchLatencyMs = 10)

  private def crawlOn(store: TableStore, rounds: Int): Unit = {
    import spark.implicits._
    CrawlRound.inject(spark, store, web.seedUrls.toDS(), cfg, 1700000000000L)
    CrawlRound.crawl(spark, store, graft.fetch.SyntheticFetcher(web, cfg.fetchLatencyMs),
      cfg, rounds, 1700000000000L)
  }

  test("3-round crawl over IcebergStore ≡ SnapshotStore (store-agnostic loop)") {
    val ice = new IcebergStore(tmp())
    val man = new SnapshotStore(tmp())
    crawlOn(ice, 3)
    crawlOn(man, 3)
    def rows(s: TableStore) = s.load(spark, "frontier").get
      .select("url", "status", "score", "fetch_time", "retries")
    assert(rows(ice).count() == rows(man).count())
    assert(rows(ice).exceptAll(rows(man)).count() == 0,
      "iceberg-store frontier must equal manifest-store frontier")
    assert(rows(man).exceptAll(rows(ice)).count() == 0)
    // side tables committed through the same seam
    assert(ice.loadRound(spark, "fetched", 2).get.count() ==
      man.loadRound(spark, "fetched", 2).get.count())
    assert(ice.metrics(spark).get.filter(col("stage") === "fetch").count() > 0)
  }

  test("resume from the snapshot log: restart mid-crawl equals uninterrupted run") {
    val rootA = tmp(); val rootB = tmp()
    crawlOn(new IcebergStore(rootA), 2)
    crawlOn(new IcebergStore(rootB), 1)
    val resumed = new IcebergStore(rootB) // "new process" discovers via version-hint
    assert(resumed.lastCompletedRound.contains(1))
    CrawlRound.crawl(spark, resumed, graft.fetch.SyntheticFetcher(web, cfg.fetchLatencyMs),
      cfg, rounds = 1, startTimeMs = 1700000000000L)
    val fa = new IcebergStore(rootA).load(spark, "frontier").get
      .select("url", "status", "score", "fetch_time", "retries")
    val fb = resumed.load(spark, "frontier").get
      .select("url", "status", "score", "fetch_time", "retries")
    assert(fa.count() == fb.count())
    assert(fa.exceptAll(fb).count() == 0 && fb.exceptAll(fa).count() == 0)
  }

  test("metadata layout: immutable version chain, version-hint discovery, full snapshot log") {
    import spark.implicits._
    val root = tmp()
    val store = new IcebergStore(root)
    store.commit("frontier", Seq((1, "a")).toDF("k", "v"), 0)
    store.commit("frontier", Seq((2, "b")).toDF("k", "v"), 1)
    store.commit("frontier", Seq((3, "c")).toDF("k", "v"), 2)
    val metaDir = java.nio.file.Paths.get(root, "frontier", "metadata")
    // one immutable metadata file per commit + the hint
    (1 to 3).foreach(v => assert(java.nio.file.Files.exists(
      metaDir.resolve(s"v$v.metadata.json")), s"v$v.metadata.json must exist"))
    assert(java.nio.file.Files.readString(metaDir.resolve("version-hint.text")).trim == "3")
    // the log keeps every snapshot; current is the newest
    val log = store.snapshotLog("frontier")
    assert(log.map(_._2) == Seq(0, 1, 2), s"snapshot log rounds: ${log.map(_._2)}")
    assert(store.current("frontier").get.round == 2)
    // time travel by round
    assert(store.loadRound(spark, "frontier", 1).get.collect().head.getString(1) == "b")
  }

  test("monotonic rounds, rollback-as-commit, and replay after resetTo") {
    import spark.implicits._
    val store = new IcebergStore(tmp())
    store.commit("frontier", Seq((1, "r1")).toDF("k", "v"), 1)
    store.commit("frontier", Seq((2, "r2")).toDF("k", "v"), 2)
    // rewind without resetTo is rejected
    intercept[IllegalArgumentException] {
      store.commit("frontier", Seq((9, "bad")).toDF("k", "v"), 1)
    }
    // rollback: a NEW metadata version, history intact
    store.resetTo("frontier", 1)
    assert(store.current("frontier").get.round == 1)
    assert(store.load(spark, "frontier").get.collect().head.getString(1) == "r1")
    assert(store.snapshotLog("frontier").length == 2, "rollback must not erase the log")
    // replay re-commits round 2 (allowRewind covers derived tables; the
    // frontier itself moves forward from the reset pointer)
    store.commit("frontier", Seq((2, "r2-replayed")).toDF("k", "v"), 2)
    assert(store.load(spark, "frontier").get.collect().head.getString(1) == "r2-replayed")
  }

  test("same-round tag commits never overwrite the snapshot they derive from") {
    import spark.implicits._
    val store = new IcebergStore(tmp())
    store.commit("frontier", Seq((1, "base")).toDF("k", "v"), 1)
    val tag = store.freshTag("frontier", 1, "inject")
    assert(tag == "inject1")
    store.commit("frontier", Seq((1, "merged")).toDF("k", "v"), 1, tag)
    assert(store.freshTag("frontier", 1, "inject") == "inject2")
    // both snapshots readable: the tagged one is current, the base survives
    assert(store.load(spark, "frontier").get.collect().head.getString(1) == "merged")
    assert(store.loadRound(spark, "frontier", 1).get.collect().head.getString(1) == "base")
  }

  test("blob commits ride the same snapshot log (url-seen bloom envelope)") {
    import spark.implicits._
    val store = new IcebergStore(tmp())
    val sf = graft.seen.UrlSeen.build((1L to 500L).toDF("url_hash"), 2048, 0.01, 500)
    store.commitBlob("seen_bloom", graft.seen.UrlSeen.toBytes(sf), 1)
    val back = graft.seen.UrlSeen.fromBytes(spark, store.loadBlob("seen_bloom").get)
    assert((1L to 500L).forall(back.mightContain))
    assert(store.current("seen_bloom").get.round == 1)
    assert(store.snapshotLog("seen_bloom").head._6 == "blob")
  }

  test("Crawl facade runs over an IcebergStore via tableStore") {
    import spark.implicits._
    val root = tmp()
    val crawl = graft.cli.Crawl(spark, root, cfg, graft.fetch.SyntheticFetcher(web, 10),
      tableStore = Some(new IcebergStore(root)))
    crawl.inject(web.seedUrls.toDS())
    val stats = crawl.round()
    assert(stats.frontierSize > 0)
    assert(crawl.store.isInstanceOf[IcebergStore])
    assert(crawl.stats.count() > 0)
  }
}
