package graft.score

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.frontier.{CrawlConfig, UpdateDb}
import graft.schema.CrawlStatus

/** scoring-adaptive plugin (reference src/plugin/scoring-adaptive/
  * AdaptiveScoringFilter.java) — the CommonCrawl fork's production
  * generator scorer. The generator SORT VALUE (not the page score)
  * adapts to page score, crawl status, elapsed time and retry count:
  *
  *   sort  = score                                     (initSort=1 × score)
  *         + factor.fetchtime   × days_since_scheduled_fetch   (:333-343)
  *         + sort.by_status[status]                            (:345-348)
  *         + sort.by_status["Content-Type:" mime]              (:349-352)
  *         + (unfetched && retries > 0
  *              ? −retries × penalty.fetch_retry               (:354-357)
  *              : unfetched && days ≤ 7 ? boost.injected : 0)  (:358-364)
  *         − factor.lastseentime × days_since_last_seen        (:366-376)
  *
  * Expressed as ONE Catalyst column over frontier columns so it rides
  * inside whole-stage codegen below the generate shuffle — no UDF, no
  * extra pass. `generate.min.score` thresholds the SORT value when this
  * plugin is active (reference Generator.java applies scoreThreshold to
  * the scoring-filter sort value, not the raw score).
  *
  * Documented API changes vs the reference:
  *  - the random fetch-time jitter (factor.fetchtime.random, default 0.0
  *    and experimental) is not reproduced — determinism is a design goal
  *    of this engine (oracle parity, resumable rounds);
  *  - last-seen rides the SAME `_orphan_` epoch-seconds stamp that the
  *    scoring-orphan twin maintains (reference keeps a parallel `_lst_`
  *    minutes stamp; one canonical stamp serves both plugins here);
  *  - the Content-Type metadata key is `content_type` (what
  *    db.parsemeta.to.crawldb / the mime-adaptive schedule already
  *    stamp), not the reference's `Content-Type` Writable.
  *
  * The per-status orphan retirement (:407-457) is realized in both
  * updatedb twins — see [[orphanStatusFor]] and the columnar expression
  * in UpdateDbColumnar.
  */
object AdaptiveScoring {

  /** Parse the reference's `adaptive-scoring.txt` (readSortFile:286-324):
    * `status \t sortvalue` lines, `Content-Type:<mime>` prefix for mime
    * boosts, # comments and blank lines skipped, malformed lines dropped.
    * Returns (statusSort by byte value, contentTypeSort). */
  def parseSortFile(text: String): (Map[Int, Double], Map[String, Double]) = {
    val statusByName: Map[String, Int] =
      (1 to 8).map(i => CrawlStatus.name(i.toByte) -> i).toMap
    val status = Map.newBuilder[Int, Double]
    val ct = Map.newBuilder[String, Double]
    text.linesIterator.foreach { line =>
      if (line.trim.nonEmpty && !line.startsWith("#")) {
        val splits = line.split("\t")
        if (splits.length >= 2) splits(1).trim.toDoubleOption.foreach { v =>
          if (splits(0).startsWith("Content-Type:"))
            ct += splits(0).substring("Content-Type:".length) -> v
          else statusByName.get(splits(0)).foreach(s => status += s -> v)
        }
      }
    }
    (status.result(), ct.result())
  }

  /** The generator sort value as a single codegen-friendly column over
    * (score, status, fetch_time, retries, metadata). `now` is the
    * generate cur-time (epoch ms). */
  def sortValue(cfg: CrawlConfig, now: Long): Column = {
    val days = floor((lit(now) - col("fetch_time")) / lit(86400000L))
    var s = col("score").cast("double")
    if (cfg.adaptiveFetchTimeFactor > 0.0)
      s = s + lit(cfg.adaptiveFetchTimeFactor) * days
    if (cfg.adaptiveStatusSort.nonEmpty)
      s = s + coalesce(
        element_at(typedLit(cfg.adaptiveStatusSort), col("status").cast("int")), lit(0.0))
    if (cfg.adaptiveContentTypeSort.nonEmpty)
      s = s + coalesce(
        element_at(typedLit(cfg.adaptiveContentTypeSort),
          element_at(col("metadata"), lit("content_type"))), lit(0.0))
    val unfetched = col("status") === lit(CrawlStatus.DB_UNFETCHED.toInt)
    s = s + when(unfetched && col("retries") > 0,
        -col("retries").cast("double") * lit(cfg.adaptiveRetryPenalty))
      .when(unfetched && days <= 7, lit(cfg.adaptiveInjectedBoost))
      .otherwise(lit(0.0))
    if (cfg.adaptiveLastSeenFactor > 0.0) {
      val lastSec = element_at(col("metadata"), lit(UpdateDb.OrphanKey)).try_cast("long")
      val daysSince = floor((lit(now / 1000L) - lastSec) / lit(86400L))
      s = s - when(lastSec.isNotNull && daysSince > 0,
        lit(cfg.adaptiveLastSeenFactor) * daysSince).otherwise(lit(0.0))
    }
    s
  }

  /** Per-status orphan retirement (AdaptiveScoringFilter.orphanedScore
    * :407-457): a row NOT seen (by seed or inlink) within its status
    * class's time span is retired to db_orphan. Classes, checked in
    * reference order: any-status span; redirect span; gone-class span
    * (db_gone, db_duplicate, or unfetched with ≥3 retries); unfetched
    * span. Rows with no last-seen stamp default to "seen now" and are
    * never retired (:276-283). Unlike scoring-orphan this never emits
    * db_gone — only db_orphan. Returns the (possibly) replaced status. */
  def orphanStatusFor(status: Byte, retries: Int, lastSeenSec: Option[Long],
                      cfg: CrawlConfig, now: Long): Byte = {
    import CrawlStatus._
    lastSeenSec match {
      case None => status
      case Some(last) =>
        val elapsed = now / 1000L - last
        val redirect = status == DB_REDIR_TEMP || status == DB_REDIR_PERM
        val goneClass = status == DB_GONE || status == DB_DUPLICATE ||
          (status == DB_UNFETCHED && retries >= 3)
        if (elapsed > cfg.adaptiveOrphanAnySec) DB_ORPHAN
        else if (redirect && elapsed > cfg.adaptiveOrphanRedirectSec) DB_ORPHAN
        else if (goneClass && elapsed > cfg.adaptiveOrphanGoneSec) DB_ORPHAN
        else if (status == DB_UNFETCHED && elapsed > cfg.adaptiveOrphanUnfetchedSec) DB_ORPHAN
        else status
    }
  }

  /** Columnar twin of [[orphanStatusFor]] for UpdateDbColumnar: the same
    * decision tree as a Catalyst expression. `statusCol` must already be
    * the post-state-machine status; `lastSec` the parsed `_orphan_` stamp
    * (nullable long, seconds). */
  def orphanStatusExpr(statusCol: Column, retriesCol: Column, lastSec: Column,
                       cfg: CrawlConfig, now: Long): Column = {
    import CrawlStatus._
    val elapsed = lit(now / 1000L) - lastSec
    val redirect = statusCol === DB_REDIR_TEMP || statusCol === DB_REDIR_PERM
    val goneClass = statusCol === DB_GONE || statusCol === DB_DUPLICATE ||
      (statusCol === DB_UNFETCHED && retriesCol >= 3)
    when(lastSec.isNull, statusCol)
      .when(elapsed > cfg.adaptiveOrphanAnySec, lit(DB_ORPHAN))
      .when(redirect && elapsed > cfg.adaptiveOrphanRedirectSec, lit(DB_ORPHAN))
      .when(goneClass && elapsed > cfg.adaptiveOrphanGoneSec, lit(DB_ORPHAN))
      .when(statusCol === DB_UNFETCHED && elapsed > cfg.adaptiveOrphanUnfetchedSec, lit(DB_ORPHAN))
      .otherwise(statusCol)
  }
}
