package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.cli.Crawl
import graft.frontier.CrawlConfig

/** scoring-metadata (reference src/plugin/scoring-metadata
  * MetadataScoringFilter): three stage-gated key lists relay metadata
  * datum→content→parse→outlink targets. A frontier key must appear in ALL
  * THREE lists to reach outlinks; content-stage values (content_type) need
  * content.md ∩ parse.md; parse-computed values (title) need parse.md. */
class ScoringMetadataSpec extends AnyFunSuite with SparkSpecBase {

  private def tmp(): String = java.nio.file.Files.createTempDirectory("graft-scmd").toString

  private val S = "http://sm.fix.test/"
  private val A = "http://sm.fix.test/a"

  private def run(cfg: CrawlConfig): Map[String, Map[String, String]] = {
    val web = LinkWeb(Map(S -> Seq(A)))
    val crawl = Crawl(spark, tmp(), cfg.copy(serverDelayMs = 0, fetchLatencyMs = 0, signer = "md5"), web)
    import spark.implicits._
    crawl.inject(Seq(s"$S\tlabel=seedtag\tother=x").toDS())
    crawl.round(); crawl.round()
    crawl.frontier.collect().map { r =>
      r.getAs[String]("url") ->
        Option(r.getAs[Map[String, String]]("metadata")).getOrElse(Map.empty)
    }.toMap
  }

  test("frontier key listed in all three stage lists relays to outlinks; partial listing does not") {
    for (columnar <- Seq(false, true)) {
      val f = run(CrawlConfig(columnarUpdateDb = columnar,
        scoringMetadataDb = Seq("label", "other"),
        scoringMetadataContent = Seq("label"),
        scoringMetadataParse = Seq("label")))
      assert(f(A).get("label").contains("seedtag"),
        s"columnar=$columnar: db∩content∩parse key relays")
      assert(!f(A).contains("other"),
        s"columnar=$columnar: key missing from content.md/parse.md must NOT relay")
    }
  }

  test("page-sourced keys: content_type (content∩parse) and title (parse) stamp outlink targets") {
    for (columnar <- Seq(false, true)) {
      val f = run(CrawlConfig(columnarUpdateDb = columnar,
        scoringMetadataContent = Seq("content_type"),
        scoringMetadataParse = Seq("content_type", "title")))
      assert(f(A).get("content_type").contains("text/html"),
        s"columnar=$columnar: content-stage value stamped from the parent page")
      assert(f(A).get("title").contains(s"page at $S"),
        s"columnar=$columnar: parse-computed title stamped (first text span)")
      // content_type is in content.md∩parse.md but title is parse-only:
      // listing content_type in parse.md ALONE must not stamp it
      val g = run(CrawlConfig(columnarUpdateDb = columnar,
        scoringMetadataParse = Seq("content_type")))
      assert(!g(A).contains("content_type"),
        s"columnar=$columnar: content-stage key needs content.md too")
    }
  }
}
