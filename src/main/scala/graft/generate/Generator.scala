package graft.generate

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import scala.collection.mutable

import graft.frontier.CrawlConfig
import graft.schema.{CrawlStatus, FetchTask, FrontierEntry}

/** Fetchlist generation (SURVEY.md §2.5).
  *
  * The reference's Generator/Generator2 select+partition jobs
  * (reference/src/java/org/apache/nutch/crawl/Generator.java:219-296,516-643,
  * Generator2.java:283-317) re-expressed Spark-first:
  *
  *  1. eligibility filters (due by fetch_time, generate-delay block,
  *     min-score) — plain `Dataset.filter`, pushed below the shuffle;
  *  2. OPIC priority queue = salted repartition-by-host +
  *     `sortWithinPartitions(desc(score))` (the north rule's realization);
  *  3. per-host / per-domain caps + per-partition topN — stateful
  *     `mapPartitions` over the score-sorted stream (order-dependent
  *     running counts, like the reference's reducer — NOT a window);
  *  4. politeness interleave — `sortWithinPartitions` on the
  *     position-weighted URL hash so one host's URLs are spread out;
  *  5. mark-back: stamp generate_time onto selected URLs in the frontier
  *     so the next generate skips them (crawl.gen.delay).
  *
  * Skew: hot hosts listed in `hostSalt` are spread over k partition keys
  * (hash(host) + hash(url) % k) — the reference's generate-domain-limits
  * salting (URLPartitioner.java:128-133) generalized to per-host counts.
  */
object Generator {

  /** Salted partition key. saltMap: host → number of partition keys to spread
    * over. The salt is mixed INTO the hash (not added to it): k well-separated
    * key values survive the shuffle hash uniformly, where k consecutive values
    * would re-collide. */
  def partitionKey(urlCol: Column, hostCol: Column, saltMap: Map[String, Int]): Column = {
    if (saltMap.isEmpty) xxhash64(hostCol)
    else {
      val k = coalesce(element_at(typedLit(saltMap), hostCol), lit(1)).cast("long")
      xxhash64(hostCol, pmod(xxhash64(urlCol), k))
    }
  }

  def eligible(frontier: Dataset[FrontierEntry], cfg: CrawlConfig, now: Long): Dataset[FrontierEntry] = {
    val base = frontier
      .filter(col("status").isin(
        CrawlStatus.DB_UNFETCHED.toInt, CrawlStatus.DB_FETCHED.toInt,
        CrawlStatus.DB_NOTMODIFIED.toInt, CrawlStatus.DB_REDIR_TEMP.toInt,
        CrawlStatus.DB_REDIR_PERM.toInt))
      .filter(col("fetch_time") <= now)
      .filter(col("generate_time") < 0 || col("generate_time") + cfg.generateDelayMs <= now)
      .filter(col("score") >= cfg.minScore)
    // user predicate over frontier columns — the reference's JEXL expression
    // filter (CrawlDatum.execute), deliberately re-based on Spark SQL text so
    // Catalyst can push/reorder it
    cfg.generateExprFilter.fold(base)(e => base.filter(expr(e)))
  }

  /** Generate the round's fetchlist. Returns (fetchlist, updated frontier with
    * generate_time stamped on selected rows). */
  def generate(
      frontier: Dataset[FrontierEntry],
      cfg: CrawlConfig,
      now: Long,
      round: Int,
      hostSalt: Map[String, Int] = Map.empty
  ): (Dataset[FetchTask], Dataset[FrontierEntry]) = {
    val spark = frontier.sparkSession
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)

    val p = cfg.numFetchPartitions
    val perPartitionLimit = math.max(1L, (cfg.topN + p - 1) / p)
    val maxPerHost = cfg.maxPerHost
    val maxPerDomain = cfg.maxPerDomain

    val selected: Dataset[FetchTask] = eligible(frontier, cfg, now)
      .repartition(p, partitionKey(col("url"), col("host"), hostSalt))
      .sortWithinPartitions(desc("score"))
      .mapPartitions { it =>
        // order-dependent running caps, mirroring the reference reducer's
        // per-host counting with overflow (Generator.java:516-560)
        val hostCount = mutable.HashMap.empty[String, Int]
        val domainCount = mutable.HashMap.empty[String, Int]
        var emitted = 0L
        it.flatMap { e =>
          if (emitted >= perPartitionLimit) Iterator.empty
          else {
            val hc = hostCount.getOrElse(e.host, 0)
            val dc = domainCount.getOrElse(e.domain, 0)
            if (hc >= maxPerHost || dc >= maxPerDomain) Iterator.empty
            else {
              hostCount.update(e.host, hc + 1)
              domainCount.update(e.domain, dc + 1)
              emitted += 1
              Iterator(FetchTask(e.url, e.url_hash, e.host, e.domain, e.status,
                e.fetch_time, e.retries, e.fetch_interval, e.score, round))
            }
          }
        }
      }
      // politeness interleave: same-host URLs spread out within the partition
      .sortWithinPartitions(call_function("url_hash_interleave", col("url")))

    // mark-back join (reference Generator.java:1002-1040): stamp _ngt_.
    // The selected set is ≤ topN rows (tiny vs the frontier): broadcast it
    // when topN is broadcast-sized so the frontier is never shuffled;
    // at very large topN fall back to a shuffle join (AQE decides).
    val selRaw = selected.select(col("url").as("sel_url")).distinct()
    val sel = if (cfg.topN <= 200000) broadcast(selRaw) else selRaw
    val updated = frontier
      .join(sel, frontier("url") === sel("sel_url"), "left_outer")
      .withColumn("generate_time",
        when(col("sel_url").isNotNull, lit(now)).otherwise(col("generate_time")))
      .drop("sel_url")
      .as[FrontierEntry]

    (selected, updated)
  }
}
