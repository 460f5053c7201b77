package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.cli.Crawl
import graft.frontier.CrawlConfig

/** urlfilter-ignoreexempt (reference src/plugin/urlfilter-ignoreexempt
  * ExemptionUrlFilter): regex-matched outlink targets survive
  * db.ignore.external.links. */
class IgnoreExemptSpec extends AnyFunSuite with SparkSpecBase {

  private def tmp(): String = java.nio.file.Files.createTempDirectory("graft-exempt").toString

  test("exempt regex lets matching external targets through the ignore") {
    val S = "http://main.fix.test/"
    val A = "http://main.fix.test/a"       // internal: kept
    val X = "http://other.fix.test/x"      // external: dropped
    val C = "http://cdn.fix.test/asset"    // external but exempt: kept
    val web = LinkWeb(Map(S -> Seq(A, X, C)))
    val cfg = CrawlConfig(serverDelayMs = 0, fetchLatencyMs = 0, signer = "md5",
      ignoreExternalLinks = true,
      ignoreExternalExemptions = Seq((true, "//cdn\\.")))
    val crawl = Crawl(spark, tmp(), cfg, web)
    import spark.implicits._
    crawl.inject(Seq(S).toDS())
    crawl.round()
    val urls = crawl.frontier.collect().map(_.getAs[String]("url")).toSet
    assert(urls.contains(A), "internal link kept")
    assert(!urls.contains(X), s"external link dropped: $urls")
    assert(urls.contains(C), s"exempt external link survives the ignore: $urls")
  }
}
