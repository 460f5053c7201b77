package graft.tools

import org.apache.spark.sql.SparkSession

import graft.cli.CrawlRound
import graft.fixtures.{SyntheticWeb, WebConfig}
import graft.frontier.CrawlConfig

/** Scratch driver for ad-hoc verification runs (see .claude/skills/verify). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val cpus = 32
    val shm = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm"), "graft-scratch").toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", shm)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    val web = SyntheticWeb(WebConfig(nHosts = 3000, pagesPerHost = 350, hotFactor = 25))
    val cfg = CrawlConfig(topN = 800000, maxPerHost = 500,
      numFetchPartitions = cpus, serverDelayMs = 5000, fetchLatencyMs = 50)
    val root = java.nio.file.Files.createTempDirectory("graft-scratch-store").toString
    val store = new graft.store.SnapshotStore(root)
    val startTime = 1700000000000L
    CrawlRound.inject(spark, store, web.urls(spark), cfg, startTime)
    val fetcher = graft.fetch.SyntheticFetcher(web, cfg.fetchLatencyMs)
    CrawlRound.run(spark, store, fetcher, cfg.copy(topN = 20000), round = 1, startTime)
    store.resetTo("frontier", 0)
    for (i <- 1 to 4) {
      val s = CrawlRound.run(spark, store, fetcher, cfg, round = 1, startTime)
      store.resetTo("frontier", 0)
      println(f"RUN$i wall=${s.wallMs / 1000.0}%7.2fs fetched=${s.fetchedPages} " +
        s.stageMs.map { case (k, v) => s"$k=${v}ms" }.mkString(" "))
    }
    spark.stop()
  }
}
