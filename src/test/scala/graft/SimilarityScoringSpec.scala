package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.cli.CrawlRound
import graft.fixtures.{SyntheticWeb, WebConfig}
import graft.frontier.CrawlConfig
import graft.score.SimilarityScoring

/** scoring-similarity plugin semantics (reference src/plugin/
  * scoring-similarity): gold-standard TF-cosine scoring of parsed pages,
  * full-score outlink inheritance, and the columnar updatedb twin. */
class SimilarityScoringSpec extends AnyFunSuite with SparkSpecBase {

  val gold = SimilarityScoring.goldModel(
    "spark sql query plan join filter scan aggregate shuffle partition join scan")

  test("tokenize: lowercase, split, stopwords dropped") {
    assert(SimilarityScoring.tokenize("The Quick, brown FOX!") == Seq("quick", "brown", "fox"))
    assert(SimilarityScoring.tokenize("the and of to") == Seq.empty)
    assert(SimilarityScoring.tokenize(null) == Seq.empty)
    assert(SimilarityScoring.tokenize("a1-b2_c3") == Seq("a1", "b2", "c3"))
  }

  test("tokenize: shingle grams [minGram..maxGram], '_'-joined") {
    val t = SimilarityScoring.tokenize("alpha beta gamma", minGram = 2, maxGram = 3)
    assert(t == Seq("alpha_beta", "beta_gamma", "alpha_beta_gamma"))
    val t2 = SimilarityScoring.tokenize("alpha beta gamma", minGram = 1, maxGram = 2)
    assert(t2 == Seq("alpha", "beta", "gamma", "alpha_beta", "beta_gamma"))
  }

  test("gold model: exact counts and norm (sqrt 16 = 4.0)") {
    assert(gold.terms == Map("spark" -> 1L, "sql" -> 1L, "query" -> 1L, "plan" -> 1L,
      "join" -> 2L, "filter" -> 1L, "scan" -> 2L, "aggregate" -> 1L, "shuffle" -> 1L,
      "partition" -> 1L))
    assert(gold.norm == 4.0)
  }

  test("cosine: self-similarity is 1, disjoint is 0, empty is 0") {
    val self = SimilarityScoring.cosine(
      "spark sql query plan join filter scan aggregate shuffle partition join scan", gold)
    assert(math.abs(self - 1.0) < 1e-12)
    assert(SimilarityScoring.cosine("totally unrelated words here", gold) == 0.0)
    assert(SimilarityScoring.cosine("", gold) == 0.0)
    assert(SimilarityScoring.cosine("the of and", gold) == 0.0) // stopwords only
  }

  test("relational scoreDocs ≡ scalar cosine (floor-ppm)") {
    import spark.implicits._
    val texts = Seq(
      (0L, "spark join scan filter something else entirely"),
      (1L, "no overlap at all with anything relevant"),
      (2L, "join join join scan scan partition shuffle"),
      (3L, "spark sql query plan join filter scan aggregate shuffle partition join scan"),
      (4L, "the and of to")) // stopwords only: no vector, no row
    val df = texts.toDF("doc_id", "text")
    val got = SimilarityScoring.scoreDocs(df, "doc_id", "text", gold)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!got.contains(4L))
    texts.filter(_._1 != 4L).foreach { case (id, t) =>
      val expect = math.floor(SimilarityScoring.cosine(t, gold) * 1000000).toLong
      assert(got(id) == expect, s"doc $id")
    }
    assert(got(3L) == 999999L || got(3L) == 1000000L) // self-sim ~ 1.0
    assert(got(1L) == 0L)
  }

  test("similarity crawl: columnar ≡ typed, pages scored in [0,1], outlinks inherit") {
    def tmp(): String = java.nio.file.Files.createTempDirectory("graft-sim").toString
    val goldText = "alpha beta gamma delta epsilon page host content link"
    def frontierOf(c: CrawlConfig) = {
      val web = SyntheticWeb(WebConfig(nHosts = 6, pagesPerHost = 12, hotFactor = 3))
      val (store, _) = CrawlRound.syntheticCrawl(spark, web, c, rounds = 2, tmp())
      store.load(spark, "frontier").get.select(col("url"), col("status"), col("score"))
    }
    val base = CrawlConfig(scoringSimilarityGold = Some(goldText), topN = 300,
      maxPerHost = 50, numFetchPartitions = 3, serverDelayMs = 200, fetchLatencyMs = 5)
    val typed = frontierOf(base.copy(columnarUpdateDb = false))
    val columnar = frontierOf(base.copy(columnarUpdateDb = true))
    val d1 = typed.exceptAll(columnar).collect()
    val d2 = columnar.exceptAll(typed).collect()
    assert(d1.isEmpty && d2.isEmpty,
      s"typed-only:\n${d1.take(5).mkString("\n")}\ncolumnar-only:\n${d2.take(5).mkString("\n")}")
    // cosine scores live in [0,1] — unlike OPIC credit sums, which exceed 1
    // on multiply-linked URLs; fetched pages carry their own cosine score
    val scores = columnar.select(col("score")).collect().map(_.getFloat(0))
    assert(scores.forall(s => s >= 0.0f && s <= 1.0f + 1e-6f))
    val fetched = columnar.filter(col("status") === graft.schema.CrawlStatus.DB_FETCHED.toInt)
      .select(col("score")).collect().map(_.getFloat(0))
    assert(fetched.nonEmpty && fetched.exists(_ > 0.0f))
  }
}
