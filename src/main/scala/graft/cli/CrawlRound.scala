package graft.cli

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.CollectionAccumulator

import graft.fetch.{FetchPartitionMetrics, FetchedPage, Fetcher, PolitenessExecutor, SyntheticFetcher}
import graft.fixtures.{SyntheticWeb, WebConfig}
import graft.frontier.{CrawlConfig, Dedup, Inject, UpdateDb}
import graft.generate.Generator
import graft.parse.Parse
import graft.schema._
import graft.store.SnapshotStore

/** The crawl round loop (SURVEY.md §3.1): each round is an incremental batch
  * — inject (round 0) → generate → fetch → parse → updatedb → dedup — ending
  * in atomic snapshot commits, resumable from the last committed round
  * (Structured-Streaming shape: deterministic batches + exactly-once sinks).
  *
  * Shuffle points match the reference's four (inject-merge, generate-select,
  * updatedb; the generate-partition shuffle is fused into generate-select);
  * fetch and parse stay partition-local.
  */
object CrawlRound {

  case class RoundStats(
      round: Int,
      generated: Long,
      fetchedPages: Long,
      parsedDocs: Long,
      frontierSize: Long,
      frontierUnfetched: Long,
      wallMs: Long,
      virtualMsMax: Long
  )

  /** Round 0: seed the frontier. */
  def inject(
      spark: SparkSession,
      store: SnapshotStore,
      seedLines: Dataset[String],
      cfg: CrawlConfig,
      now: Long
  ): Long = {
    import spark.implicits._
    val existing = store.load(spark, "frontier")
      .map(_.as[FrontierEntry])
      .getOrElse(spark.emptyDataset[FrontierEntry])
    val merged = Inject.run(existing, seedLines, cfg, now)
    store.commit("frontier", merged.toDF(), round = 0)
    merged.count()
  }

  /** One full crawl round over the given fetcher. Reads the frontier at the
    * last committed snapshot, commits frontier/fetched/parsed at `round`. */
  def run(
      spark: SparkSession,
      store: SnapshotStore,
      fetcher: Fetcher,
      cfg: CrawlConfig,
      round: Int,
      now: Long
  ): RoundStats = {
    import spark.implicits._
    val t0 = System.nanoTime()

    val frontier = store.load(spark, "frontier")
      .getOrElse(throw new IllegalStateException("no frontier — run inject first"))
      .as[FrontierEntry]

    // --- generate ---
    val (fetchlist, markedFrontier) = Generator.generate(frontier, cfg, now, round)
    // the fetchlist is consumed twice (fetch input + mark-back); persist it
    fetchlist.persist()
    val generated = fetchlist.count()

    // --- fetch (politeness executor, partition-local) ---
    val metricsAcc: CollectionAccumulator[FetchPartitionMetrics] =
      spark.sparkContext.collectionAccumulator[FetchPartitionMetrics]("fetch_metrics")
    val pages: Dataset[FetchedPage] = fetchlist.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      PolitenessExecutor.run(pid, it, fetcher, cfg, now, round, metricsAcc.add(_))
    }
    pages.persist()
    val fetchedPages = pages.count()

    // --- parse ---
    val parsed = Parse.parsedDocs(pages)
    val parsedCount = parsed.count()
    store.commit("parsed", parsed.toDF(), round)
    store.commit("fetched", pages.toDF().drop("spans"), round)

    // --- updatedb ---
    val fetchUpdates = Parse.fetchUpdates(pages)
    val linked = Parse.linkedUpdates(pages, cfg, round)
    val newFrontier = UpdateDb.run(markedFrontier, fetchUpdates, linked, cfg, now)
    val deduped = Dedup.markDuplicates(newFrontier)
    store.commit("frontier", deduped.toDF(), round)

    // --- per-partition lineage + metrics (north rule) ---
    val fetchMetrics = metricsAcc.value
    import scala.jdk.CollectionConverters._
    val metricRows = fetchMetrics.asScala.toSeq.map(m =>
      RoundMetric(round, "fetch", m.partition_id, m.input_rows,
        m.fetched + m.robots_denied + m.robots_deferred + m.retries + m.redirects + m.gone,
        m.fetched, m.robots_denied, m.retries, m.virtual_ms))
    if (metricRows.nonEmpty)
      store.appendMetrics(spark.createDataset(metricRows).toDF(), round, "fetch")
    val virtualMsMax = if (fetchMetrics.isEmpty) 0L else fetchMetrics.asScala.map(_.virtual_ms).max

    val committed = store.load(spark, "frontier").get
    val frontierSize = committed.count()
    val unfetched = committed.filter(col("status") === CrawlStatus.DB_UNFETCHED).count()

    fetchlist.unpersist()
    pages.unpersist()

    RoundStats(round, generated, fetchedPages, parsedCount, frontierSize, unfetched,
      (System.nanoTime() - t0) / 1000000, virtualMsMax)
  }

  /** Resume-aware multi-round driver: continues after the last committed
    * round (checkpoint = the frontier manifest). */
  def crawl(
      spark: SparkSession,
      store: SnapshotStore,
      fetcher: Fetcher,
      cfg: CrawlConfig,
      rounds: Int,
      startTimeMs: Long,
      roundIntervalMs: Long = 24L * 3600 * 1000
  ): Seq[RoundStats] = {
    val first = store.lastCompletedRound.getOrElse(0) + 1
    (first until first + rounds).map { r =>
      run(spark, store, fetcher, cfg, r, startTimeMs + (r - 1) * roundIntervalMs)
    }
  }

  /** Convenience: full synthetic-web crawl from scratch in a temp store. */
  def syntheticCrawl(
      spark: SparkSession,
      web: SyntheticWeb,
      cfg: CrawlConfig,
      rounds: Int,
      storeRoot: String
  ): (SnapshotStore, Seq[RoundStats]) = {
    import spark.implicits._
    val store = new SnapshotStore(storeRoot)
    val startTime = 1700000000000L // fixed epoch: no ambient clock in the pipeline
    inject(spark, store, web.seedUrls.toDS(), cfg, startTime)
    val fetcher = SyntheticFetcher(web, cfg.fetchLatencyMs)
    (store, crawl(spark, store, fetcher, cfg, rounds, startTime))
  }
}
