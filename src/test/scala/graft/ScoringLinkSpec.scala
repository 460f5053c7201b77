package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.cli.Crawl
import graft.frontier.CrawlConfig

/** scoring-link (reference src/plugin/scoring-link
  * LinkAnalysisScoringFilter + scoring/webgraph/ScoreUpdater): OPIC off,
  * new rows at score 0, scores installed from LinkRank over the linkdb. */
class ScoringLinkSpec extends AnyFunSuite with SparkSpecBase {

  private def tmp(): String = java.nio.file.Files.createTempDirectory("graft-sclink").toString

  private val S = "http://sl.fix.test/"
  private val A = "http://sl.fix.test/a"
  private val B = "http://sl.fix.test/b"

  test("OPIC distribution off: discovered rows enter at score 0, parents keep theirs") {
    for (columnar <- Seq(false, true)) {
      val web = LinkWeb(Map(S -> Seq(A, B), A -> Seq(B)))
      val cfg = CrawlConfig(serverDelayMs = 0, fetchLatencyMs = 0, signer = "md5",
        scoringLink = true, columnarUpdateDb = columnar)
      val crawl = Crawl(spark, tmp(), cfg, web)
      import spark.implicits._
      crawl.inject(Seq(S).toDS())
      crawl.round(); crawl.round()
      val f = crawl.frontier.collect()
        .map(r => r.getAs[String]("url") -> r.getAs[Float]("score")).toMap
      assert(f(S) == 1.0f, s"columnar=$columnar: seed keeps the injected score")
      assert(f(A) == 0.0f && f(B) == 0.0f,
        s"columnar=$columnar: link-discovered rows enter at initialScore 0, links add no credit")
    }
  }

  test("ScoreUpdater: LinkRank ranks installed as frontier scores, unranked cleared") {
    val web = LinkWeb(Map(S -> Seq(A, B), A -> Seq(B), B -> Seq.empty))
    val cfg = CrawlConfig(serverDelayMs = 0, fetchLatencyMs = 0, signer = "md5",
      scoringLink = true, invertLinks = true)
    val crawl = Crawl(spark, tmp(), cfg, web)
    import spark.implicits._
    crawl.inject(Seq(S).toDS())
    crawl.round(); crawl.round(); crawl.round()
    assert(crawl.updateScoresFromWebGraph(iterations = 5))
    val f = crawl.frontier.collect()
      .map(r => r.getAs[String]("url") -> r.getAs[Float]("score")).toMap
    // B has two inlinks (S, A), A has one (S): rank(B) > rank(A) > base
    assert(f(B) > f(A), s"two-inlink page outranks one-inlink page: $f")
    assert(f(A) > 0.0f)
    // S has no inlinks in the graph but IS a node (it links out), so it
    // carries the base rank (1 - d); every score is now a LinkRank value
    assert(math.abs(f(S) - 0.15f) < 1e-5, s"seed gets the dangling base rank: ${f(S)}")
  }
}
