package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.cli.Crawl
import graft.frontier.CrawlConfig
import graft.schema.CrawlStatus

/** urlmeta plugin (reference src/plugin/urlmeta URLMetaScoringFilter):
  * configured frontier-metadata tags propagate from a fetched page onto its
  * outlink targets — newly discovered rows inherit the parent's tags,
  * existing rows keep their own, and tags stay sticky round after round. */
class UrlMetaSpec extends AnyFunSuite with SparkSpecBase {

  private def tmp(): String = java.nio.file.Files.createTempDirectory("graft-urlmeta").toString

  private val S = "http://m.fix.test/"     // tagged seed
  private val T = "http://other.fix.test/" // untagged seed
  private val A = "http://m.fix.test/a"
  private val B = "http://m.fix.test/b"
  private val C = "http://other.fix.test/c"
  private val D = "http://m.fix.test/d"

  private def tags(crawl: Crawl, key: String): Map[String, Option[String]] =
    crawl.frontier.collect().map { r =>
      r.getAs[String]("url") ->
        Option(r.getAs[Map[String, String]]("metadata")).flatMap(_.get(key))
    }.toMap

  private def runCrawl(columnar: Boolean): Map[String, Option[String]] = {
    val web = LinkWeb(Map(S -> Seq(A, B), T -> Seq(C), A -> Seq(D)))
    val cfg = CrawlConfig(serverDelayMs = 0, fetchLatencyMs = 0, signer = "md5",
      urlMetaTags = Seq("campaign"), columnarUpdateDb = columnar)
    val crawl = Crawl(spark, tmp(), cfg, web)
    import spark.implicits._
    crawl.inject(Seq(s"$S\tcampaign=x1", T, s"$B\tcampaign=pre").toDS())
    crawl.round(); crawl.round(); crawl.round()
    tags(crawl, "campaign")
  }

  test("tags propagate to new outlinks, existing rows keep theirs, transitively sticky") {
    for (columnar <- Seq(false, true)) {
      val f = runCrawl(columnar)
      assert(f(S).contains("x1"), s"columnar=$columnar: seed keeps its tag")
      assert(f(A).contains("x1"), s"columnar=$columnar: new outlink inherits")
      assert(f(C).isEmpty, s"columnar=$columnar: untagged parent's outlink stays untagged")
      assert(f(D).contains("x1"),
        s"columnar=$columnar: transitive — A inherited the tag, D inherits from A")
      // B existed at inject time with its own tag: linked metadata must NOT
      // overwrite it (CrawlDbReducer keeps old metadata for existing rows)
      assert(f(B).contains("pre"), s"columnar=$columnar: existing row keeps its own tag, got ${f(B)}")
    }
  }

  test("off by default: no metadata maps on linked rows") {
    val web = LinkWeb(Map(S -> Seq(A)))
    val cfg = CrawlConfig(serverDelayMs = 0, fetchLatencyMs = 0, signer = "md5")
    val crawl = Crawl(spark, tmp(), cfg, web)
    import spark.implicits._
    crawl.inject(Seq(s"$S\tcampaign=x1").toDS())
    crawl.round(); crawl.round()
    val f = tags(crawl, "campaign")
    assert(f(S).contains("x1"))
    assert(f(A).isEmpty, "without urlMetaTags nothing propagates")
  }
}
