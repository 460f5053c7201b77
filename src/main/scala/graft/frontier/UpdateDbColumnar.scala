package graft.frontier

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.schema.{CrawlStatus, FrontierEntry, FrontierUpdate}

/** Whole-stage-codegen updatedb: the same state machine as UpdateDb.merge,
  * expressed as two outer joins + column expressions.
  *
  * Valid because the round pipeline guarantees at most ONE row per URL on
  * each side (the fetchlist is distinct; link credits are pre-aggregated in
  * Parse.linkedUpdates), so the reference's co-group degenerates to joins —
  * and Tungsten executes them without a single object allocation per row,
  * where the typed flatMapGroups path allocates case classes + maps for
  * every row (GC-bound at 32 threads).
  *
  * UpdateDb.merge (the typed reference implementation) remains the
  * semantic oracle: UpdateDbSpec drives the transition matrix through it,
  * and UpdateDbColumnarSpec asserts columnar ≡ typed on full crawl rounds.
  */
object UpdateDbColumnar {
  import CrawlStatus._

  def run(
      frontier: Dataset[FrontierEntry],
      fetched: Dataset[FrontierUpdate],
      linked: Dataset[FrontierUpdate],
      cfg: CrawlConfig,
      now: Long
  ): Dataset[FrontierEntry] = {
    val spark = frontier.sparkSession
    import spark.implicits._

    val old = frontier.toDF().select(
      col("url"), col("url_hash"), col("host"), col("domain"),
      col("status").as("o_status"), col("fetch_time").as("o_time"),
      col("retries").as("o_retries"), col("fetch_interval").as("o_interval"),
      col("score").as("o_score"), col("signature").as("o_sig"),
      col("modified_time").as("o_mod"), col("repr_url").as("o_repr"),
      col("metadata").as("o_meta"))

    val f = fetched.toDF().select(
      col("url").as("f_url"), col("status").as("f_status"),
      col("fetch_time").as("f_time"), col("signature").as("f_sig"),
      col("repr_url").as("f_repr"), col("metadata").as("f_meta"))

    val l = linked.toDF().select(
      col("url").as("l_url"), col("score").as("l_credit"))

    val joined = old
      .join(f, col("url") === col("f_url"), "full_outer")
      .join(l, coalesce(col("url"), col("f_url")) === col("l_url"), "full_outer")

    val url = coalesce(col("url"), col("f_url"), col("l_url"))
    val hasOld = col("o_status").isNotNull
    val hasFetch = col("f_status").isNotNull
    val hasLink = col("l_credit").isNotNull

    // base (= old row, or a schedule-initialized new row)
    val bInterval = coalesce(col("o_interval"), lit(cfg.fetchIntervalDefault))
    val bRetries = coalesce(col("o_retries"), lit(0))
    val bScore = coalesce(col("o_score"), lit(0.0f))
    val bSig = col("o_sig") // null for new
    val bTime = coalesce(col("o_time"), lit(now))
    val bMod = coalesce(col("o_mod"), lit(0L))

    val fs = col("f_status")
    val isSuccess = fs === FETCH_SUCCESS
    val isRedirP = fs === FETCH_REDIR_PERM
    val isRedirT = fs === FETCH_REDIR_TEMP
    val isNotMod = fs === FETCH_NOTMODIFIED
    val isRetry = fs === FETCH_RETRY
    val isGone = fs === FETCH_GONE
    val isScheduled = isSuccess || isRedirP || isRedirT || isNotMod

    // modified detection (success only): 1 = modified, 2 = not modified
    val modified = when(isSuccess,
      when(col("f_sig").isNull || bSig.isNull, 1)
        .when(col("f_sig") === bSig, 2)
        .otherwise(1)).otherwise(0)

    // schedule arithmetic (Default / Adaptive per cfg)
    val schedInterval: Column =
      if (!cfg.adaptiveSchedule) bInterval
      else {
        val raw = when(modified === 1, bInterval.cast("float") * (1.0f - cfg.adaptiveDecRate))
          .when(modified === 2, bInterval.cast("float") * (1.0f + cfg.adaptiveIncRate))
          .otherwise(bInterval.cast("float"))
        least(greatest(raw, lit(cfg.adaptiveMinInterval.toFloat)), lit(cfg.fetchIntervalMax.toFloat))
          .cast("int")
      }
    val schedTime = col("f_time") + schedInterval.cast("long") * 1000L

    // retry / gone schedules
    val retryRetries = bRetries + 1
    val goneInterval = least(bInterval.cast("float") * 1.5f, lit(cfg.fetchIntervalMax * 0.9f))
      .cast("int")
    val goneIntervalFloored = greatest(goneInterval, lit(1))

    // modified_time propagation on schedule (reference passes fetch modifiedTime or old)
    val schedMod = bMod // FetchResult carries no modified_time in this engine

    // per-fetch-status outcome columns
    val newStatus = when(!hasFetch, coalesce(col("o_status"), lit(DB_UNFETCHED)))
      .when(isNotMod, lit(DB_NOTMODIFIED))
      .when(isSuccess && modified === 2, lit(DB_NOTMODIFIED))
      .when(isSuccess, lit(DB_FETCHED))
      .when(isRedirP, lit(DB_REDIR_PERM))
      .when(isRedirT, lit(DB_REDIR_TEMP))
      .when(isRetry && retryRetries < cfg.retryMax, lit(DB_UNFETCHED))
      .when(isRetry, lit(DB_GONE))
      .when(isGone, lit(DB_GONE))
      .otherwise(coalesce(col("o_status"), lit(DB_UNFETCHED)))

    val newTime = when(!hasFetch, bTime)
      .when(isScheduled, schedTime)
      .when(isRetry && retryRetries < cfg.retryMax, col("f_time") + 24L * 3600 * 1000)
      .when(isRetry || isGone,
        col("f_time") + goneIntervalFloored.cast("long") * 1000L)
      .otherwise(bTime)

    val newInterval = when(!hasFetch, bInterval)
      .when(isScheduled, schedInterval)
      .when(isRetry && retryRetries < cfg.retryMax, bInterval)
      .when(isRetry || isGone, goneIntervalFloored)
      .otherwise(bInterval)

    val newRetries = when(!hasFetch, bRetries)
      .when(isScheduled, lit(0))
      .when(isRetry, retryRetries)
      .otherwise(bRetries)

    val newSig = when(!hasFetch, bSig)
      .when(isNotMod, bSig)
      .when(isSuccess && modified === 2, bSig)
      .when(isSuccess || isRedirP || isRedirT, col("f_sig"))
      .otherwise(bSig)

    val newMod = when(hasFetch && isSuccess && modified === 1, col("f_time"))
      .otherwise(schedMod)

    val newRepr = when(hasFetch && (isRedirP || isRedirT), col("f_repr"))
      .otherwise(col("o_repr"))

    // metadata: old ∪ fetch, fetch wins (both may be null)
    val newMeta = when(hasFetch && hasOld, map_concat_safe(col("o_meta"), col("f_meta")))
      .when(hasFetch, coalesce(col("f_meta"), emptyMeta))
      .otherwise(coalesce(col("o_meta"), emptyMeta))

    // OPIC credit
    val newScore = (bScore + coalesce(col("l_credit"), lit(0.0f))).cast("float")

    // interval overflow ⇒ forceRefetch (status unfetched, defaults, sig null)
    val overflow = hasFetch && isScheduled && (newInterval > cfg.fetchIntervalMax)

    val host = call_function("url_host", url)
    graft.functions.GraftFunctions.register(spark)

    val result = joined
      // drop: nothing at all, or link-only when additions are disallowed
      .filter(hasOld || hasFetch || (hasLink && lit(cfg.additionsAllowed)))
      .filter(lit(cfg.purge404) === false || newStatus =!= DB_GONE)
      .select(
        url.as("url"),
        coalesce(col("url_hash"), call_function("url_hash64", url)).as("url_hash"),
        coalesce(col("host"), host).as("host"),
        coalesce(col("domain"), call_function("url_domain", host)).as("domain"),
        when(overflow, lit(DB_UNFETCHED)).otherwise(newStatus).cast("byte").as("status"),
        when(overflow, coalesce(col("f_time"), lit(now))).otherwise(newTime).as("fetch_time"),
        when(overflow, lit(0)).otherwise(newRetries).cast("int").as("retries"),
        when(overflow, lit(cfg.fetchIntervalDefault)).otherwise(newInterval).cast("int").as("fetch_interval"),
        newScore.as("score"),
        when(overflow, lit(null).cast("binary")).otherwise(newSig).as("signature"),
        when(overflow, lit(0L)).otherwise(newMod).as("modified_time"),
        newRepr.as("repr_url"),
        lit(-1L).as("generate_time"),
        newMeta.as("metadata"))

    result.as[FrontierEntry]
  }

  private def emptyMeta: Column =
    map_from_arrays(array().cast("array<string>"), array().cast("array<string>"))

  /** map union where the right side wins on key conflict — duplicate keys
    * are removed BEFORE map_from_entries (whose default dedup policy throws). */
  private def map_concat_safe(a: Column, b: Column): Column = {
    val aa = coalesce(a, emptyMeta)
    val bb = coalesce(b, emptyMeta)
    map_from_entries(concat(
      filter(map_entries(aa), e => !map_contains_key(bb, e.getField("key"))),
      map_entries(bb)))
  }
}
