package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch driver for ad-hoc verification runs (see .claude/skills/verify). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", "/dev/shm/graft-scratch-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    // bloom session-cache evidence: consecutive rounds at ~1M-URL scale.
    // Round 1 builds + broadcasts the filter; rounds 2-3 must reuse the
    // cached broadcast (seen_bloom stage pays only the delta merge).
    val web = graft.fixtures.SyntheticWeb(
      graft.fixtures.WebConfig(nHosts = 3000, pagesPerHost = 350, hotFactor = 25))
    val cfg = graft.frontier.CrawlConfig(topN = 200000, maxPerHost = 200,
      numFetchPartitions = 8, serverDelayMs = 5000, fetchLatencyMs = 50)
    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm"), "graft-bloomcache").toString
    val store = new graft.store.SnapshotStore(root)
    import spark.implicits._
    graft.cli.CrawlRound.inject(spark, store, web.urls(spark), cfg, 1700000000000L)
    val fetcher = graft.fetch.SyntheticFetcher(web, cfg.fetchLatencyMs)
    val hits0 = graft.seen.UrlSeen.cacheHits.get()
    val stats = graft.cli.CrawlRound.crawl(spark, store, fetcher, cfg, 3, 1700000000000L)
    stats.foreach(s => println(
      s"round ${s.round}: wall=${s.wallMs}ms seen_bloom=${s.stageMs.getOrElse("seen_bloom", -1L)}ms " +
      s"fetched=${s.fetchedPages} frontier=${s.frontierSize}"))
    println(s"cacheHits: ${graft.seen.UrlSeen.cacheHits.get() - hits0} (expect 2)")
    spark.stop()
  }
}
