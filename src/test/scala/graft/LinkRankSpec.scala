package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.frontier.LinkRank

class LinkRankSpec extends AnyFunSuite with SparkSpecBase {

  test("star graph: the hub out-ranks the spokes; deterministic across runs") {
    import spark.implicits._
    val edges = (1 to 9).map(i => (s"http://spoke$i/", "http://hub/")) ++
      Seq(("http://hub/", "http://spoke1/"))
    val df = edges.toDF("from_url", "to_url")
    val ranks = LinkRank.run(df, iterations = 60).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // analytic fixed point: h = .15 + .85(8×.15 + s1), s1 = .15 + .85h
    // ⇒ h ≈ 4.6757, s1 ≈ 4.1243; spokes 2..9 stay at 1 − d = 0.15
    assert(math.abs(ranks("http://hub/") - 4.6757) < 0.01)
    assert(math.abs(ranks("http://spoke1/") - 4.1243) < 0.01)
    assert(math.abs(ranks("http://spoke2/") - 0.15) < 1e-9)
    assert(ranks("http://hub/") > ranks("http://spoke1/"))
    val again = LinkRank.run(df, iterations = 60).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ranks == again)
  }

  test("chain converges: downstream accumulates rank, checkpointing keeps values") {
    import spark.implicits._
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("from_url", "to_url")
    val r5 = LinkRank.run(edges, iterations = 5, checkpointEvery = 2).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(r5("d") > r5("c") && r5("c") > r5("b") && r5("b") >= r5("a"))
    // closed form for the head of the chain: rank(a) = 1 - d
    assert(math.abs(r5("a") - 0.15) < 1e-9)
  }

  test("runs over the crawl's real linkdb edges") {
    import spark.implicits._
    val web = graft.fixtures.SyntheticWeb(graft.fixtures.WebConfig(nHosts = 5, pagesPerHost = 10))
    val cfg = graft.frontier.CrawlConfig(topN = 200, numFetchPartitions = 2,
      serverDelayMs = 50, fetchLatencyMs = 2)
    val root = java.nio.file.Files.createTempDirectory("graft-lr").toString
    val crawl = graft.cli.Crawl(spark, root, cfg, graft.fetch.SyntheticFetcher(web, 2))
    crawl.inject(web.seedUrls.toDS())
    crawl.rounds(2)
    val pages = crawl.store.loadRound(spark, "fetched", 2)
    // rebuild edges from parsed spans (fetched table drops spans)
    val parsed = crawl.parsed(2).get
    val edges = parsed.select(col("doc_id").as("from_url"),
        explode(filter(col("spans"), s => s.getField("kind") === "link")).as("l"))
      .select(col("from_url"), col("l.media_ref").as("to_url"))
    val ranks = LinkRank.run(edges, iterations = 5)
    assert(ranks.count() > 0)
    assert(ranks.agg(min("rank")).collect().head.getDouble(0) >= 0.15 - 1e-9)
  }
}
