package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.index.{GeoIpFilter, LanguageFilter}
import graft.parse.{HtmlOps, ParseFilters}

/** language-identifier (lang field precedence + whitelist drop), index-geoip
  * (bucketized range join), parsefilter-debug (DOM stamp), and
  * HTMLLanguageParser's metadata language extraction. */
class LangGeoDebugSpec extends AnyFunSuite with SparkSpecBase {
  import spark.implicits._

  // --- language-identifier -------------------------------------------------

  test("lang precedence: parse_meta ≻ content_language header ≻ detector ≻ unknown") {
    val docs = Seq(
      ("d1", "the cat and the dog of war", Map("lang" -> "fi"), "de"),
      ("d2", "the cat and the dog of war", Map.empty[String, String], "de"),
      ("d3", "the cat and the dog of war", Map.empty[String, String], null),
      ("d4", "zzz qqq", Map.empty[String, String], null)
    ).toDF("url", "text", "parse_meta", "content_language")
    val out = LanguageFilter()(docs).select("url", "lang").as[(String, String)].collect().toMap
    assert(out("d1") == "fi")      // parse-time identification wins
    assert(out("d2") == "de")      // Content-Language header next
    assert(out("d3") == "en")      // marker detector fallback
    assert(out("d4") == "unknown") // nothing determinable
  }

  test("lang.index.languages whitelist drops other-language documents") {
    val docs = Seq(
      ("d1", Map("lang" -> "en")),
      ("d2", Map("lang" -> "fr"))
    ).toDF("url", "parse_meta")
    val kept = LanguageFilter(indexLangs = Set("en"))(docs).select("url").as[String].collect()
    assert(kept.toSeq == Seq("d1"))
  }

  test("htmlLang mirrors HTMLLanguageParser metadata precedence") {
    val pages = Seq(
      ("p1", """<html lang="sv"><head><meta name="DC.Language" content="fi"><meta http-equiv="Content-Language" content="de"></head></html>"""),
      ("p2", """<html lang="sv"><head><meta http-equiv="Content-Language" content="de"></head></html>"""),
      ("p3", """<html lang="sv"><body></body></html>"""),
      ("p4", """<html><body>nothing declared</body></html>""")
    ).toDF("url", "html")
    val out = pages.select(col("url"), HtmlOps.htmlLang(col("html")).as("lang"))
      .as[(String, String)].collect().toMap
    assert(out("p1") == "fi") // dc.language first
    assert(out("p2") == "de") // then meta content-language
    assert(out("p3") == "sv") // then the html lang attribute
    assert(out("p4") == null)
  }

  // --- index-geoip ----------------------------------------------------------

  private def ip(s: String): Long = {
    val p = s.split("\\.").map(_.toLong)
    p(0) * 16777216L + p(1) * 65536L + p(2) * 256L + p(3)
  }

  test("geoip range join resolves IPs, spans /16 boundaries, keeps unmatched rows") {
    val ranges = Seq(
      (ip("10.0.0.0"), ip("10.0.0.255"), "AA", "Alpha"),
      // crosses two /16 buckets: 10.1.255.0 .. 10.2.0.255
      (ip("10.1.255.0"), ip("10.2.0.255"), "BB", "Beta")
    ).toDF("start_ip", "end_ip", "country_code", "city")
    val docs = Seq(
      ("d1", "10.0.0.7"),    // inside Alpha
      ("d2", "10.2.0.9"),    // inside Beta's second /16
      ("d3", "10.1.254.9"),  // same /16 as Beta's start, OUTSIDE the range
      ("d4", "192.168.1.1")  // bucket with no ranges at all
    ).toDF("url", "ip")
    val out = GeoIpFilter(ranges)(docs)
    assert(out.columns.toSeq == Seq("url", "ip", "country_code", "city"))
    val byUrl = out.select("url", "country_code", "city")
      .as[(String, String, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byUrl("d1") == (("AA", "Alpha")))
    assert(byUrl("d2") == (("BB", "Beta")))
    assert(byUrl("d3") == ((null, null)), "bucket hit but range miss keeps the row unresolved")
    assert(byUrl("d4") == ((null, null)))
    assert(out.count() == 4)
  }

  test("geoip is a broadcast hash join on the bucket, and a no-op without an ip column") {
    val ranges = Seq((ip("10.0.0.0"), ip("10.0.255.255"), "AA")).toDF("start_ip", "end_ip", "cc")
    val docs = Seq(("d1", "10.0.3.4")).toDF("url", "ip")
    val plan = GeoIpFilter(ranges)(docs).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast hash join:\n$plan")
    assert(!plan.contains("NestedLoop"), "range predicate must ride the equi-join as residual")
    val noIp = Seq(("d1", "t")).toDF("url", "title")
    assert(GeoIpFilter(ranges)(noIp).columns.toSeq == Seq("url", "title"))
  }

  // --- parsefilter-debug ----------------------------------------------------

  test("stampDom serializes the span interpretation into parse_meta[DOM]") {
    val docs = Seq(
      ("d1", Seq(graft.schema.Span("text", "hello", null, 0),
                 graft.schema.Span("link", null, "http://x.test/", 1)))
    ).toDF("doc_id", "spans")
    val out = ParseFilters.stampDom(docs)
      .select(element_at(col("parse_meta"), "DOM")).as[String].collect().head
    assert(out ==
      "<doc>\n  <span kind=\"text\" order=\"0\">hello</span>\n" +
      "  <span kind=\"link\" order=\"1\">http://x.test/</span>\n</doc>")
    // existing parse_meta entries survive the stamp
    val withMeta = Seq(("d1", Seq(graft.schema.Span("text", "t", null, 0)), Map("k" -> "v")))
      .toDF("doc_id", "spans", "parse_meta")
    val m = ParseFilters.stampDom(withMeta)
      .select(col("parse_meta")).as[Map[String, String]].collect().head
    assert(m("k") == "v" && m.contains("DOM"))
    // re-stamping replaces the DOM entry instead of throwing on the
    // duplicate key (default map-key dedup policy is EXCEPTION)
    val twice = ParseFilters.stampDom(ParseFilters.stampDom(withMeta))
      .select(col("parse_meta")).as[Map[String, String]].collect().head
    assert(twice("k") == "v" && twice("DOM") == m("DOM"))
  }

  test("crawl round stamps DOM into the parsed snapshot when parseFilterDebug is on") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-dbg").toString
    val S = "http://dbg.fix.test/"
    val web = LinkWeb(Map(S -> Seq(S + "a")))
    val cfg = graft.frontier.CrawlConfig(serverDelayMs = 0, fetchLatencyMs = 0,
      signer = "md5", parseFilterDebug = true)
    val crawl = graft.cli.Crawl(spark, tmp, cfg, web)
    crawl.inject(Seq(S).toDS())
    crawl.round()
    val dom = crawl.parsed(1).get.select(element_at(col("parse_meta"), "DOM"))
      .as[String].collect()
    assert(dom.nonEmpty && dom.forall(d => d != null && d.startsWith("<doc>")))
  }
}
