package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch driver for ad-hoc verification runs (see .claude/skills/verify). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    // full multi-round crawl through the public API: exercises the new bloom
    // broadcast lifecycle (load → merge → destroy), hostdb reset-on-success,
    // _ngt_ clear-on-write, and robots exact-token matching in one drive
    val web = graft.fixtures.SyntheticWeb(
      graft.fixtures.WebConfig(nHosts = 40, pagesPerHost = 30, hotFactor = 8))
    val cfg = graft.frontier.CrawlConfig(topN = 2000, maxPerHost = 60,
      numFetchPartitions = 8, serverDelayMs = 500, fetchLatencyMs = 10,
      updateHostDb = true, skipHostsWithExceptions = 10)
    val root = java.nio.file.Files.createTempDirectory("graft-scratch").toString
    val (store, stats) = graft.cli.CrawlRound.syntheticCrawl(spark, web, cfg, rounds = 4, root)
    stats.foreach(s => println(
      s"round ${s.round}: generated=${s.generated} fetched=${s.fetchedPages} " +
      s"parsed=${s.parsedDocs} frontier=${s.frontierSize} unfetched=${s.frontierUnfetched} " +
      s"wall=${s.wallMs}ms"))
    println(s"frontier rows: ${store.load(spark, "frontier").get.count()}")
    println(s"host_stats rows: ${store.load(spark, "host_stats").get.count()}")
    println(s"seen_bloom round: ${store.current("seen_bloom").map(_.round)}")
    spark.stop()
  }
}
