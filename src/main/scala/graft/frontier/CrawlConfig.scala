package graft.frontier

/** All crawl knobs in one place. Defaults mirror the reference's operational
  * defaults (reference/conf/nutch-default.xml, src/bin/crawl) — see
  * BASELINE.md "Reference operational envelope".
  */
case class CrawlConfig(
    // frontier / updatedb
    fetchIntervalDefault: Int = 30 * 24 * 3600,  // db.fetch.interval.default (s)
    fetchIntervalMax: Int = 90 * 24 * 3600,      // db.fetch.interval.max (s)
    retryMax: Int = 3,                           // db.fetch.retry.max
    maxInlinks: Int = 10000,                     // db.update.max.inlinks
    additionsAllowed: Boolean = true,            // db.update.additions.allowed
    purge404: Boolean = false,                   // db.update.purge.404
    injectedScore: Float = 1.0f,                 // db.score.injected
    scoreInternalFactor: Float = 1.0f,           // db.score.link.internal
    scoreExternalFactor: Float = 1.0f,           // db.score.link.external
    adaptiveSchedule: Boolean = false,           // Default vs Adaptive schedule
    adaptiveIncRate: Float = 0.4f,               // db.fetch.schedule.adaptive.inc_rate
    adaptiveDecRate: Float = 0.2f,               // db.fetch.schedule.adaptive.dec_rate
    adaptiveMinInterval: Int = 60,               // ...adaptive.min_interval (s)
    columnarUpdateDb: Boolean = true,            // whole-stage-codegen updatedb (UpdateDbColumnar)
    // generator
    topN: Long = 50000,                          // SIZE_FETCHLIST
    maxPerHost: Int = 100,                       // generate.max.count (mode host)
    maxPerDomain: Int = Int.MaxValue,
    generateDelayMs: Long = 7L * 24 * 3600 * 1000, // crawl.gen.delay (re-generate block)
    numFetchPartitions: Int = 8,                 // ≙ fetch task count
    minScore: Float = Float.NegativeInfinity,    // generate.min.score
    updateHostDb: Boolean = true,                // per-round host_stats + hot-host salt feedback
    invertLinks: Boolean = false,                // per-round linkdb inversion (optional, like the reference)
    generateExprFilter: Option[String] = None,   // Spark SQL predicate over frontier columns
                                                 // (replaces the reference's JEXL expressions)
    signer: String = "textprofile",              // content signature: "textprofile" | "md5"
    fetchTimeLimitMs: Long = Long.MaxValue,      // fetcher.timelimit: drain queues past this (virtual) time
    realClock: Boolean = false,                  // wall-clock politeness sleeps (real fetchers); tests/benches simulate
    frontierBuckets: Int = 0,                    // >0: frontier snapshots bucketed by url_hash and
                                                 // sorted by reversed host (point-lookup pruning + locality)
    // fetch politeness
    serverDelayMs: Long = 5000,                  // fetcher.server.delay
    minCrawlDelayMs: Long = 0,                   // fetcher.min.crawl.delay
    maxCrawlDelayMs: Long = 30000,               // fetcher.max.crawl.delay
    threadsPerQueue: Int = 1,                    // fetcher.threads.per.queue
    queueDepth: Int = 50,                        // fetcher.queue.depth.multiplier
    redirectMax: Int = 3,                        // http.redirect.max
    maxExceptionsPerQueue: Int = 10,             // fetcher.max.exceptions.per.queue
    fetchLatencyMs: Long = 50,                   // synthetic per-request serve time
    // parse
    maxOutlinksPerPage: Int = 100,               // db.max.outlinks.per.page
    maxOutlinkLength: Int = 4096,
    ignoreExternalLinks: Boolean = false,
    // seen
    bloomExpectedItems: Long = 1L << 22,
    bloomFpp: Double = 0.01
)
