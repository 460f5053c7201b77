package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.index._

/** IndexingFilter chain semantics (reference IndexingFilters.java + the
  * index-basic / index-more / tld / subcollection / mimetype-filter /
  * index-static / index-metadata / index-jexl-filter plugins). */
class IndexingFiltersSpec extends AnyFunSuite with SparkSpecBase {

  import spark.implicits._

  def docs0 = Seq(
    ("http://sub.example.co.uk/a/page.html", "A Long Title Far Beyond The Max", "hello world content", 1700000000000L),
    ("http://www.example.com/img/pic.png", "Pic", "binary-ish", 1700000001000L),
    ("http://other.org/p", "Other", "plain words here", 1700000002000L)
  ).toDF("url", "title", "text", "fetch_time")

  test("index-basic: host, title truncation, tstamp") {
    val out = BasicFieldsFilter(maxTitleLength = 10)(docs0)
    val r = out.orderBy("url").collect()
    assert(out.columns.contains("host") && out.columns.contains("tstamp"))
    val byUrl = r.map(x => x.getAs[String]("url") -> x).toMap
    assert(byUrl("http://sub.example.co.uk/a/page.html").getAs[String]("host") == "sub.example.co.uk")
    assert(byUrl("http://sub.example.co.uk/a/page.html").getAs[String]("title") == "A Long Tit")
    assert(byUrl("http://other.org/p").getAs[Long]("tstamp") == 1700000002000L)
  }

  test("index-more: type split + content_length") {
    val out = MoreFieldsFilter()(docs0)
    val byUrl = out.collect().map(x => x.getAs[String]("url") -> x).toMap
    val html = byUrl("http://sub.example.co.uk/a/page.html")
    assert(html.getAs[String]("type") == "text/html")
    assert(html.getAs[String]("primary_type") == "text")
    assert(html.getAs[String]("sub_type") == "html")
    assert(html.getAs[Long]("content_length") == "hello world content".length.toLong)
    assert(byUrl("http://www.example.com/img/pic.png").getAs[String]("type") == "image/png")
  }

  test("tld: public-suffix field") {
    val out = TldFilter()(docs0)
    val tlds = out.select("url", "tld").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(tlds("http://sub.example.co.uk/a/page.html") == "co.uk")
    assert(tlds("http://other.org/p") == "org")
  }

  test("subcollection: whitelist prefix, blacklist veto, multi-membership") {
    val f = SubcollectionFilter(Seq(
      SubcollectionDef("uk", Seq("http://sub.example.co.uk")),
      SubcollectionDef("all", Seq("http://")),
      SubcollectionDef("nope", Seq("http://"), blackPrefixes = Seq("http://"))))
    val out = f(docs0).select("url", "subcollection").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("http://sub.example.co.uk/a/page.html") == "uk,all")
    assert(out("http://other.org/p") == "all")
  }

  test("mimetype-filter: ordered rules drop documents; first match wins") {
    val out = MimeTypeFilter(Seq(false -> "image/*"), defaultAccept = true)(MoreFieldsFilter()(docs0))
    assert(out.count() == 2)
    assert(!out.select("url").as[String].collect().exists(_.contains("png")))
    val acceptOnly = MimeTypeFilter(Seq(true -> "image/png", false -> "image/*"),
      defaultAccept = false)(MoreFieldsFilter()(docs0))
    assert(acceptOnly.select("url").as[String].collect().toSeq == Seq("http://www.example.com/img/pic.png"))
  }

  test("index-static + index-metadata + expr filter") {
    val withMeta = docs0.withColumn("parse_meta",
      map(lit("author"), concat(lit("au-"), col("url"))))
    val chain = IndexingFilterChain(Seq(
      StaticFieldsFilter(Map("site" -> "graft", "tier" -> "crawl")),
      MetadataFieldsFilter(Seq("author", "missing_key")),
      ExprIndexingFilter("url NOT LIKE '%png%'")))
    val out = chain(withMeta)
    assert(out.count() == 2)
    val r = out.filter(col("url").contains("other")).collect().head
    assert(r.getAs[String]("site") == "graft" && r.getAs[String]("tier") == "crawl")
    assert(r.getAs[String]("author") == "au-http://other.org/p")
    assert(r.getAs[String]("missing_key") == null)
  }

  test("index-arbitrary: expression fields — create, overwrite, multivalued add") {
    val chain = IndexingFilterChain(Seq(ArbitraryFieldsFilter(Seq(
      ("word_count", "size(split(text, ' '))", false),      // new field: created
      ("title", "upper(title)", true),                      // overwrite existing
      ("text", "'extra'", false),                           // add → array(old, new)
      ("text", "'extra2'", false)))))                       // add again → append
    val r = chain(docs0).filter(col("url").contains("other")).collect().head
    assert(r.getAs[Int]("word_count") == 3)
    assert(r.getAs[String]("title") == "OTHER")
    assert(r.getSeq[String](r.fieldIndex("text")).toList ==
      List("plain words here", "extra", "extra2"))
  }

  test("index-replace: scoped regex replacement, write-on-match, target field") {
    val filter = ReplaceFilter.parseConf(
      """hostmatch=\.co\.uk$
        |title=/Long/Short/
        |urlmatch=\.png$
        |title:title_upper=/^(.*)$/IMG $1/
        |text=/BINARY/B/2
        |""".stripMargin)
    val out = filter(docs0)
    val byUrl = out.collect().map(x => x.getAs[String]("url") -> x).toMap
    // host-scoped: only the .co.uk doc's title rewritten
    assert(byUrl("http://sub.example.co.uk/a/page.html").getAs[String]("title")
      == "A Short Title Far Beyond The Max")
    assert(byUrl("http://www.example.com/img/pic.png").getAs[String]("title") == "Pic")
    // url-scoped with target field: only the .png doc gets title_upper
    assert(byUrl("http://www.example.com/img/pic.png").getAs[String]("title_upper") == "IMG Pic")
    assert(byUrl("http://other.org/p").getAs[String]("title_upper") == null)
    // flags component (2 = CASE_INSENSITIVE): 'binary' matched via (?i)
    assert(byUrl("http://www.example.com/img/pic.png").getAs[String]("text") == "B-ish")
    assert(byUrl("http://other.org/p").getAs[String]("text") == "plain words here")
  }

  test("parsefilter-regex: flags from html/text sources, malformed rules skipped") {
    import graft.parse.ParseFilters
    val rules = ParseFilters.parseRules(
      """# comment
        |has_world text world
        |has_div html <div\sclass="x">
        |broken justtwo
        |""".stripMargin)
    assert(rules.map(_.field) == Seq("has_world", "has_div"))
    val docsH = docs0.withColumn("html",
      when(col("url").endsWith(".html"), lit("""<p><div class="x">hi</div></p>"""))
        .otherwise(lit("<p>no div</p>")))
    val out = ParseFilters.flagColumns(docsH, rules)
    val byUrl = out.collect().map(x => x.getAs[String]("url") -> x).toMap
    assert(byUrl("http://sub.example.co.uk/a/page.html").getAs[String]("has_world") == "true")
    assert(byUrl("http://other.org/p").getAs[String]("has_world") == "false")
    assert(byUrl("http://sub.example.co.uk/a/page.html").getAs[String]("has_div") == "true")
    assert(byUrl("http://www.example.com/img/pic.png").getAs[String]("has_div") == "false")

    // stampParseMeta folds into an existing parse_meta map
    val withMeta = docsH.withColumn("parse_meta", map(lit("k"), lit("v")))
    val pm = ParseFilters.stampParseMeta(withMeta, rules).collect()
      .map(x => x.getAs[String]("url") -> x.getAs[Map[String, String]]("parse_meta")).toMap
    assert(pm("http://sub.example.co.uk/a/page.html") ==
      Map("k" -> "v", "has_world" -> "true", "has_div" -> "true"))
  }

  test("index-anchor: dedup + sort; host-dedup keeps one anchor per linking host") {
    val linkdb = Seq(
      ("http://t.test/a", Seq(
        ("http://h1.test/p1", "click"), ("http://h1.test/p2", "here"),
        ("http://h2.test/p3", "click"), ("http://h2.test/p4", ""))),
      ("http://t.test/b", Seq(("http://h1.test/p9", "b-link")))
    ).toDF("url", "raw")
      .select(col("url"), expr(
        "transform(raw, r -> named_struct('from_url', r._1, 'anchor', r._2))").as("inlinks"))
    val docs = Seq("http://t.test/a", "http://t.test/b", "http://t.test/c").toDF("url")
    val plain = AnchorFilter(linkdb)(docs).collect()
      .map(r => r.getAs[String]("url") -> r.getAs[String]("anchor")).toMap
    assert(plain("http://t.test/a") == "click|here") // deduped, sorted, empty dropped
    assert(plain("http://t.test/b") == "b-link")
    assert(plain("http://t.test/c") == null) // no inlinks: null field survives join
    val byHost = AnchorFilter(linkdb, deduplicateByHost = true)(docs).collect()
      .map(r => r.getAs[String]("url") -> r.getAs[String]("anchor")).toMap
    assert(byHost("http://t.test/a") == "click") // first anchor per host: h1→click, h2→click
  }

  test("index-links: inlink urls or hosts, internal links ignorable") {
    val linkdb = Seq(
      ("http://t.test/a", Seq("http://t.test/self", "http://h1.test/x", "http://h2.test/y"))
    ).toDF("url", "raw")
      .select(col("url"), expr(
        "transform(raw, r -> named_struct('from_url', r, 'anchor', 'z'))").as("inlinks"))
    val docs = Seq("http://t.test/a").toDF("url")
    val urls = LinksFilter(linkdb)(docs).collect().head.getAs[String]("inlinks")
    assert(urls == "http://h1.test/x|http://h2.test/y|http://t.test/self")
    val hosts = LinksFilter(linkdb, hostsOnly = true)(docs).collect().head.getAs[String]("inlinks")
    assert(hosts == "h1.test|h2.test|t.test")
    val ext = LinksFilter(linkdb, hostsOnly = true, ignoreInternal = true)(docs)
      .collect().head.getAs[String]("inlinks")
    assert(ext == "h1.test|h2.test") // same-host t.test dropped
  }

  test("exportIndex runs the chain end-to-end on a real crawl round") {
    import graft.cli.CrawlRound
    import graft.fixtures.{SyntheticWeb, WebConfig}
    import graft.frontier.CrawlConfig
    val tmp = java.nio.file.Files.createTempDirectory("graft-idx").toString
    val cfg = CrawlConfig(topN = 200, maxPerHost = 40, numFetchPartitions = 2,
      serverDelayMs = 200, fetchLatencyMs = 5)
    val web = SyntheticWeb(WebConfig(nHosts = 4, pagesPerHost = 10, hotFactor = 2))
    val (store, _) = CrawlRound.syntheticCrawl(spark, web, cfg, rounds = 1, tmp)
    val crawl = graft.cli.Crawl(spark, tmp, cfg, graft.fetch.SyntheticFetcher(web, 5))
    val chain = IndexingFilterChain(Seq(
      BasicFieldsFilter(), MoreFieldsFilter(), TldFilter(),
      StaticFieldsFilter(Map("collection" -> "test"))))
    val idx = crawl.exportIndex(1, chain).get
    assert(idx.count() > 0)
    assert(Seq("host", "type", "primary_type", "tld", "collection").forall(idx.columns.contains))
    assert(idx.select("collection").distinct().as[String].collect().toSeq == Seq("test"))
  }
}
