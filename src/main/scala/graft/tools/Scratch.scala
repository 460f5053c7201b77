package graft.tools

import org.apache.spark.sql.SparkSession

import graft.cli.Crawl
import graft.fetch.SyntheticFetcher
import graft.fixtures.{SyntheticWeb, WebConfig}
import graft.frontier.CrawlConfig

/** Ad-hoc driving entry for verification (see .claude/skills/verify):
  * runs a small crawl through the public facade and prints the plans of a
  * few headline queries. Edit freely when verifying a change. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._

    val web = SyntheticWeb(WebConfig(nHosts = 8, pagesPerHost = 12))
    val cfg = CrawlConfig(topN = 300, numFetchPartitions = 2,
      serverDelayMs = 200, fetchLatencyMs = 5, invertLinks = true)
    val root = java.nio.file.Files.createTempDirectory("graft-scratch").toString
    val crawl = Crawl(spark, root, cfg, SyntheticFetcher(web, cfg.fetchLatencyMs))
    crawl.inject(web.seedUrls.toDS())
    val stats = crawl.rounds(2)
    stats.foreach(s => println(s"ROUND ${s.round}: generated=${s.generated} fetched=${s.fetchedPages} " +
      s"frontier=${s.frontierSize} stages=${s.stageMs}"))
    crawl.stats.show()
    crawl.domainStats.show(5)
    println("explain of q_scan_filter_project (pushdown check):")
    graft.SparkEntry.queries("q_scan_filter_project")(spark, "/root/testdata/sf0.001").explain("formatted")
    spark.stop()
  }
}
