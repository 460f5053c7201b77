package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Working verification driver (edited per change under test). Currently:
  * plan audits of the round-4 paths — the CDX layout window and the
  * sharded bloom probe — plus the UrlSeen cache behavior smoke. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)

    // --- CDX layout plan: expect ONE shuffle (by cdx_file) for the window ---
    val web = graft.fixtures.SyntheticWeb(graft.fixtures.WebConfig(nHosts = 6, pagesPerHost = 10))
    val cfg = graft.frontier.CrawlConfig(topN = 200, maxPerHost = 50, numFetchPartitions = 2,
      serverDelayMs = 200, fetchLatencyMs = 5)
    val root = java.nio.file.Files.createTempDirectory("graft-scratch").toString
    val (store, _) = graft.cli.CrawlRound.syntheticCrawl(spark, web, cfg, 1, root)
    val fetched = store.loadRound(spark, "fetched", 1).get
    val recs = graft.index.WarcExport.records(fetched, None, 1)
    val layout = graft.index.Cdx.layout(recs, 4, "warc-r1")
    println("=== Cdx.layout plan ===")
    layout.explain("formatted")
    println("exchanges in CDX layout plan: " +
      layout.queryExecution.executedPlan.toString.linesIterator.count(_.contains("Exchange")))

    // --- sharded probe plan: expect the Or-chain probe INSIDE codegen ---
    val sharded = graft.seen.UrlSeen.build((1L to 10000L).toDF("url_hash"), 1 << 14, 0.01,
      10000, shards = 4)
    val single = graft.seen.UrlSeen.build((1L to 10000L).toDF("url_hash"), 1 << 14, 0.01, 10000)
    val src = spark.range(1, 100001).select(col("id").as("url_hash"))
    val probe = src
      .filter(!graft.seen.UrlSeen.mightContainCol(spark, sharded, col("url_hash")))
    val probeSingle = src
      .filter(!graft.seen.UrlSeen.mightContainCol(spark, single, col("url_hash")))
    println("single probe Filter inside WholeStageCodegen: " + probeSingle.queryExecution
      .executedPlan.toString.linesIterator.exists(l => l.contains("*") && l.contains("Filter")))
    println("=== sharded probe plan ===")
    probe.explain("formatted")
    val plan = probe.queryExecution.executedPlan.toString
    // codegen markers: compact plan trees prefix codegen'd nodes with '*'
    println("probe Filter inside WholeStageCodegen: " + plan.linesIterator
      .exists(l => l.trim.matches("^[+:>-]*\\s*\\*.*Filter.*")))
    println("probe rows (definitely-new of 100k vs 10k seen): " + probe.count())

    spark.stop()
  }
}
