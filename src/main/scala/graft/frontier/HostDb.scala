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

  def fromFrontier(frontier: Dataset[FrontierEntry], now: Long): Dataset[HostStats] = {
    val spark = frontier.sparkSession
    import spark.implicits._
    def cnt(s: Byte): org.apache.spark.sql.Column =
      count(when(col("status") === s.toInt, 1))
    frontier.toDF()
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
      .as[HostStats]
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
