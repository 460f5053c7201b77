package graft.tools

import org.apache.spark.sql.SparkSession

/** Working verification driver (edited per change under test). Currently:
  * drive the user-rule regex normalizer + pass normalizer through the
  * public chain surface — a crawl round whose config carries
  * extraUrlNormalizers must produce frontier keys with the rules applied
  * on BOTH the seed and the discovered-link paths. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._

    val rules = graft.url.RegexRuleNormalizer.parseXml(
      """<?xml version="1.0"?>
        |<regex-normalize>
        |  <regex><pattern>(?i)[?&amp;]sid=[0-9a-f]+</pattern><substitution></substitution></regex>
        |</regex-normalize>""".stripMargin)
    val chain = Seq(rules, graft.url.PassNormalizer)

    // seed + linked web where every page links with a session id attached
    val base = "http://norm.fix.test/"
    import graft.fetch.{Fetcher, ProtocolResponse}
    import graft.fixtures.RobotsPolicy
    import graft.schema.{Doc, Span}
    case class LinkWeb(links: Map[String, Seq[String]]) extends Fetcher {
      override def fetch(url: String): ProtocolResponse = {
        val targets = links.getOrElse(url, Seq.empty)
        val spans = Span("text", s"page at $url", null, 0) +:
          targets.zipWithIndex.map { case (t, i) => Span("link", s"l$i", t, i + 1) }
        ProtocolResponse("SUCCESS", null, Doc(url, spans), "text/html", 1)
      }
      override def robots(host: String): RobotsPolicy = RobotsPolicy.AllowAll
    }
    val web = LinkWeb(Map(
      base -> Seq(base + "a?sid=99ff", base + "b?x=1&sid=0abc"),
      base + "a" -> Seq(base + "b?x=1&sid=dead"),
      base + "b?x=1" -> Nil))
    val tmp = java.nio.file.Files.createTempDirectory("graft-scratch").toString
    val cfg = graft.frontier.CrawlConfig(serverDelayMs = 0, fetchLatencyMs = 0,
      signer = "md5", extraUrlNormalizers = chain)
    val crawl = graft.cli.Crawl(spark, tmp, cfg, web)
    crawl.inject(Seq(base + "?sid=f00d").toDS())
    crawl.round(); crawl.round()
    val urls = crawl.frontier.select("url").as[String].collect().sorted
    println("frontier:")
    urls.foreach(u => println("  " + u))
    assert(urls.contains(base) && urls.contains(base + "a") && urls.contains(base + "b?x=1"),
      "session-id stripped on seed AND link paths")
    assert(!urls.exists(_.contains("sid=")), "no sid= key survives the chain")
    println("OK: regex-rule normalizer applied on seed + link paths, " + urls.length + " frontier rows")
    spark.stop()
  }
}
