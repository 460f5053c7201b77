package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.frontier.CrawlConfig
import graft.generate.Generator
import graft.schema.{CrawlStatus, FrontierEntry}
import graft.url.Urls

/** Generator behaviors, mirroring the reference's TestGenerator
  * (reference/src/test/org/apache/nutch/crawl/TestGenerator.java:81-353):
  * score-descending selection, per-host limits, eligibility filters. */
class GeneratorSpec extends AnyFunSuite with SparkSpecBase {

  val now = 1700000000000L

  def entry(url: String, score: Float, status: Byte = CrawlStatus.DB_UNFETCHED,
            fetchTime: Long = now - 1000, genTime: Long = -1L): FrontierEntry = {
    val host = Urls.hostOf(url)
    FrontierEntry(url, Urls.hash64(url), host, Urls.registeredDomainOf(host),
      status, fetchTime, 0, 2592000, score, null, 0L, null, genTime, Map.empty)
  }

  test("top-N by descending score, per partition") {
    import spark.implicits._
    val frontier = (1 to 100).map(i => entry(s"http://h$i.example.com/", i.toFloat)).toDS()
    val cfg = CrawlConfig(topN = 10, numFetchPartitions = 1, maxPerHost = 100)
    val (list, _) = Generator.generate(frontier, cfg, now, 1)
    val got = list.collect()
    assert(got.length == 10)
    // with a single partition, the global top-10 scores are selected
    assert(got.map(_.score).sorted.reverse.toSeq == (91 to 100).reverse.map(_.toFloat).toSeq)
  }

  test("generate.count.mode=domain: Generator2 grouped secondary sort, exact per-domain cap") {
    import spark.implicits._
    // one registered domain spread over 3 hosts (would split across host-hash
    // partitions in host mode) + an unrelated domain
    val multi = (1 to 3).flatMap(h => (1 to 10).map(i =>
      entry(s"http://h$h.bigcorp.example.com/p$i", (h * 100 + i).toFloat)))
    val other = (1 to 10).map(i => entry(s"http://solo.example.org/p$i", 50f + i))
    val frontier = (multi ++ other).toDS()
    val cfg = CrawlConfig(topN = 1000, numFetchPartitions = 4, maxPerHost = 100,
      maxPerDomain = 7, generateCountMode = "domain")
    val (list, _) = Generator.generate(frontier, cfg, now, 1)
    val tasks = list.rdd.mapPartitionsWithIndex((pid, it) =>
      it.map(t => (pid, t))).collect()

    // exact cap: the multi-host domain yields exactly maxPerDomain URLs...
    // (registered domain of hN.bigcorp.example.com is example.com)
    val big = tasks.filter(_._2.domain == "example.com")
    assert(big.length == 7, s"exact per-domain cap expected 7, got ${big.length}")
    // ...in ONE partition (never split), and they are the domain's top-7
    assert(big.map(_._1).distinct.length == 1, "a domain must not split across partitions")
    assert(big.map(_._2.score).sorted.reverse.toSeq ==
      multi.map(_.score).sorted.reverse.take(7).toSeq,
      "the per-domain selection must keep the domain's best-scored URLs")
    // each domain's URLs were processed best-first within the partition
    // (grouped secondary sort): verify via the selection = prefix of the
    // domain's score-descending order
    val soloScores = tasks.filter(_._2.domain == "example.org").map(_._2.score)
    assert(soloScores.sorted.reverse.toSeq == other.map(_.score).sorted.reverse.take(soloScores.length).toSeq)
  }

  test("domain mode emits the skew warning when one domain exceeds the per-partition target") {
    import spark.implicits._
    // perPartitionLimit = topN/p = 5; the mega-domain's eligible run is 40
    val mega = (1 to 40).map(i => entry(s"http://h${i % 4}.mega.example.com/p$i", i.toFloat))
    val small = (1 to 3).map(i => entry(s"http://tiny$i.example.org/", 1f))
    val cfg = CrawlConfig(topN = 10, numFetchPartitions = 2, maxPerHost = 100,
      maxPerDomain = 100, generateCountMode = "domain")
    val acc = spark.sparkContext.longAccumulator("skew-test")
    val (list, _) = Generator.generate((mega ++ small).toDS(), cfg, now, 1,
      domainSkewAcc = Some(acc))
    list.collect() // materialize the mapPartitions so the accumulator fires
    assert(acc.value >= 1, s"the 40-row domain must trip the skew warning (got ${acc.value})")
    // and a balanced frontier stays quiet
    val acc2 = spark.sparkContext.longAccumulator("skew-test-2")
    val balanced = (1 to 8).map(i => entry(s"http://only.d$i.example.org/", i.toFloat))
    val (list2, _) = Generator.generate(balanced.toDS(),
      cfg.copy(topN = 100), now, 1, domainSkewAcc = Some(acc2))
    list2.collect()
    assert(acc2.value == 0, s"no domain over target, expected no warning (got ${acc2.value})")
  }

  test("per-host cap: at most maxPerHost URLs of one host") {
    import spark.implicits._
    val frontier = ((1 to 50).map(i => entry(s"http://hot.example.com/p$i", 100f + i)) ++
      (1 to 20).map(i => entry(s"http://h$i.example.com/", i.toFloat))).toDS()
    val cfg = CrawlConfig(topN = 1000, numFetchPartitions = 2, maxPerHost = 5)
    val (list, _) = Generator.generate(frontier, cfg, now, 1)
    val byHost = list.collect().groupBy(_.host)
    assert(byHost("hot.example.com").length == 5)
    // and the 5 kept are the highest-scoring ones of that host
    assert(byHost("hot.example.com").map(_.score).sorted.reverse.toSeq ==
      (146 to 150).reverse.map(_.toFloat).toSeq)
  }

  test("eligibility: future fetch_time, recent generate_time, gone status excluded") {
    import spark.implicits._
    val frontier = Seq(
      entry("http://a.example.com/", 1f),                                     // eligible
      entry("http://b.example.com/", 1f, fetchTime = now + 1000000),          // not due
      entry("http://c.example.com/", 1f, genTime = now - 1000),               // recently generated
      entry("http://d.example.com/", 1f, status = CrawlStatus.DB_GONE),       // gone
      entry("http://e.example.com/", 1f, status = CrawlStatus.DB_DUPLICATE),  // duplicate
      entry("http://f.example.com/", 1f, genTime = now - 8L * 24 * 3600 * 1000) // gen delay passed
    ).toDS()
    val cfg = CrawlConfig(topN = 100, numFetchPartitions = 1)
    val (list, _) = Generator.generate(frontier, cfg, now, 1)
    assert(list.collect().map(_.url).sorted.toSeq ==
      Seq("http://a.example.com/", "http://f.example.com/"))
  }

  test("mark-back stamps generate_time only on selected rows") {
    import spark.implicits._
    val frontier = (1 to 20).map(i => entry(s"http://h$i.example.com/", i.toFloat)).toDS()
    val cfg = CrawlConfig(topN = 5, numFetchPartitions = 1)
    val (list, updated) = Generator.generate(frontier, cfg, now, 1)
    val sel = list.collect().map(_.url).toSet
    val marked = updated.collect()
    assert(marked.count(_.generate_time == now) == sel.size)
    assert(marked.filter(e => sel.contains(e.url)).forall(_.generate_time == now))
    assert(marked.filter(e => !sel.contains(e.url)).forall(_.generate_time == -1L))
  }

  test("host stays in one partition (politeness co-location)") {
    import spark.implicits._
    val frontier = (for (h <- 1 to 10; p <- 1 to 20)
      yield entry(s"http://h$h.example.com/p$p", p.toFloat)).toDS()
    val cfg = CrawlConfig(topN = 10000, numFetchPartitions = 4, maxPerHost = 100)
    val (list, _) = Generator.generate(frontier, cfg, now, 1)
    val partsPerHost = list
      .withColumn("pid", spark_partition_id())
      .groupBy("host").agg(countDistinct("pid").as("np"))
      .collect()
    assert(partsPerHost.nonEmpty)
    assert(partsPerHost.forall(_.getAs[Long]("np") == 1L), "each host must map to exactly one partition")
  }

  test("hot-host salting spreads a host over k partitions") {
    import spark.implicits._
    val frontier = (1 to 400).map(i => entry(s"http://hot.example.com/p$i", i.toFloat)).toDS()
    val cfg = CrawlConfig(topN = 10000, numFetchPartitions = 8, maxPerHost = 1000)
    val (list, _) = Generator.generate(frontier, cfg, now, 1, hostSalt = Map("hot.example.com" -> 8))
    val nParts = list.withColumn("pid", spark_partition_id())
      .select("pid").distinct().count()
    // 8 salted keys into 8 partitions: expect ≥ 4 distinct (collisions are
    // birthday-bounded; at production P≈1000s the loss is negligible)
    assert(nParts >= 4, s"salted hot host should spread over several partitions, got $nParts")
  }
}
