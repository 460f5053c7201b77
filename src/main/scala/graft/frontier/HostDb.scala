package graft.frontier

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.schema.{CrawlStatus, FrontierEntry, HostStats}

/** Per-host aggregate statistics (HostDatum equivalent,
  * reference/src/java/org/apache/nutch/hostdb/UpdateHostDbReducer.java:160-367):
  * one partial-aggregating groupBy over the frontier — plus the hot-host
  * detector that feeds the generator's salt map (the reference's
  * generate-domain-limits file, computed from data instead of hand-kept).
  */
object HostDb {
  import CrawlStatus._

  /** Frontier status counts per host, plus fetch-failure counters when the
    * round's fetch results are supplied (the reference's DNS/connection
    * failure tallies, UpdateHostDbReducer.java:160-367 — here: transient
    * exceptions and robots denials per host from crawl_fetch rows). Counters
    * are PER-ROUND; pass the previous host_stats as `prev` to accumulate. */
  def fromFrontier(
      frontier: Dataset[FrontierEntry],
      now: Long,
      fetchedPages: Option[DataFrame] = None,
      prev: Option[DataFrame] = None
  ): Dataset[HostStats] = {
    val spark = frontier.sparkSession
    import spark.implicits._
    def cnt(s: Byte): org.apache.spark.sql.Column =
      count(when(col("status") === s.toInt, 1))
    val base = frontier.toDF()
      .groupBy(col("host"))
      .agg(
        cnt(DB_UNFETCHED).as("unfetched"),
        cnt(DB_FETCHED).as("fetched"),
        cnt(DB_NOTMODIFIED).as("not_modified"),
        cnt(DB_REDIR_TEMP).as("redir_temp"),
        cnt(DB_REDIR_PERM).as("redir_perm"),
        cnt(DB_GONE).as("gone"),
        max(col("score")).as("score"),
        lit(now).as("last_check"))
    val failures = fetchedPages.map { p =>
      p.groupBy(col("host"))
        .agg(
          count(when(col("protocol_status").isin("EXCEPTION", "QUEUE_PURGED"), 1)).as("f_exc"),
          count(when(col("protocol_status") === "ROBOTS_DENIED", 1)).as("f_den"),
          count(when(col("protocol_status") === "SUCCESS", 1)).as("f_ok"))
    }
    val withFail = failures match {
      case Some(f) => base.join(f, Seq("host"), "left_outer")
        .withColumn("exceptions", coalesce(col("f_exc"), lit(0L)))
        .withColumn("robots_denied", coalesce(col("f_den"), lit(0L)))
        .withColumn("_ok", coalesce(col("f_ok"), lit(0L)))
        .drop("f_exc", "f_den", "f_ok")
      case None => base
        .withColumn("exceptions", lit(0L))
        .withColumn("robots_denied", lit(0L))
        .withColumn("_ok", lit(0L))
    }
    // Reset-on-success (reference hostdb/ResolverThread.java:78-106 zeroes a
    // host's failure counters on successful resolution): a round with ≥1
    // successful fetch restarts the host's tallies at this round's values,
    // so the generator's skipHostsWithExceptions throttle is a recoverable
    // brake, not a one-way door. Hosts that never fetch keep accumulating.
    val accumulated = prev match {
      case Some(pr) =>
        val p = pr.select(col("host"),
          col("exceptions").as("p_exc"), col("robots_denied").as("p_den"))
        withFail.join(p, Seq("host"), "left_outer")
          .withColumn("exceptions",
            when(col("_ok") > 0, col("exceptions"))
              .otherwise(col("exceptions") + coalesce(col("p_exc"), lit(0L))))
          .withColumn("robots_denied",
            when(col("_ok") > 0, col("robots_denied"))
              .otherwise(col("robots_denied") + coalesce(col("p_den"), lit(0L))))
          .drop("p_exc", "p_den")
      case None => withFail
    }
    accumulated.drop("_ok").as[HostStats]
  }

  /** Hosts whose pending (unfetched) mass exceeds `hotThreshold` get spread
    * over ceil(pending / perPartitionTarget) partition keys next round.
    * Collected to the driver: the hot set is tiny by construction. */
  def hotHostSalt(stats: Dataset[HostStats], hotThreshold: Long, perPartitionTarget: Long): Map[String, Int] = {
    stats.toDF()
      .filter(col("unfetched") > hotThreshold)
      .select(col("host"), ceil(col("unfetched").cast("double") / perPartitionTarget).cast("int").as("k"))
      .collect()
      .map(r => r.getString(0) -> math.max(1, r.getInt(1)))
      .toMap
  }
}
