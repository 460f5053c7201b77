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
    val dir = "/root/testdata/sf0.001"

    println("=== q_parse_html plan (ReadSchema pruning + no shuffle) ===")
    graft.parse.HtmlOps.parseHtmlStats(spark.read.parquet(s"$dir/documents.parquet"))
      .explain("formatted")

    println("=== WarcExport.records plan (projections + union, no shuffle) ===")
    val web = graft.fixtures.SyntheticWeb(graft.fixtures.WebConfig(nHosts = 6, pagesPerHost = 10))
    val cfg = graft.frontier.CrawlConfig(topN = 200, maxPerHost = 40, numFetchPartitions = 2,
      serverDelayMs = 200, fetchLatencyMs = 5)
    val root = java.nio.file.Files.createTempDirectory("graft-scratch").toString
    val (store, _) = graft.cli.CrawlRound.syntheticCrawl(spark, web, cfg, rounds = 1, root)
    val fetched = store.loadRound(spark, "fetched", 1).get
    val parsed = store.loadRound(spark, "parsed", 1)
    graft.index.WarcExport.records(fetched, parsed, 1).explain("formatted")

    println("=== domain-mode generate plan ===")
    import spark.implicits._
    val frontier = store.load(spark, "frontier").get.as[graft.schema.FrontierEntry]
    val (fl, _) = graft.generate.Generator.generate(frontier,
      cfg.copy(generateCountMode = "domain"), 1700000100000L, 2)
    fl.explain("formatted")
    spark.stop()
  }
}
