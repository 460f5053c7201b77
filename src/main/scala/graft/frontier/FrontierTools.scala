package graft.frontier

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.schema.FrontierEntry

/** Frontier maintenance tools beyond the round loop. */
object FrontierTools {

  /** N-way CrawlDb merge (reference CrawlDbMerger.java:48-60): same-URL rows
    * resolve to the newest fetch_time; metadata accumulates newer-over-older. */
  def mergeDbs(dbs: Seq[Dataset[FrontierEntry]]): Dataset[FrontierEntry] = {
    require(dbs.nonEmpty, "mergeDbs needs at least one frontier")
    val spark = dbs.head.sparkSession
    import spark.implicits._
    dbs.reduce(_ unionByName _)
      .groupByKey(_.url)
      .reduceGroups { (a, b) =>
        val (newer, older) = if (a.fetch_time >= b.fetch_time) (a, b) else (b, a)
        newer.copy(metadata = older.metadata ++ newer.metadata)
      }
      .map(_._2)
  }

  /** Filter + renormalize pass over the whole db (reference CrawlDbFilter):
    * optional 404/orphan purge, re-canonicalize, drop filtered. Cheap status
    * predicates run before URL work (Catalyst orders them anyway). */
  def filterAndNormalize(frontier: Dataset[FrontierEntry], purge404: Boolean): Dataset[FrontierEntry] = {
    val spark = frontier.sparkSession
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val base = if (purge404)
      frontier.toDF().filter(col("status") =!= graft.schema.CrawlStatus.DB_GONE.toInt)
    else frontier.toDF()
    base
      .withColumn("_canon", call_function("url_canon_filter", col("url")))
      .filter(col("_canon").isNotNull)
      .withColumn("url", col("_canon"))
      .withColumn("url_hash", call_function("url_hash64", col("url")))
      .withColumn("host", call_function("url_host", col("url")))
      .withColumn("domain", call_function("url_domain", col("host")))
      .drop("_canon")
      .as[FrontierEntry]
  }

  /** Per-domain/host random URL sample (reference UrlSampler: rand per
    * domain, ≤ k per domain and ≤ kHost per host). Deterministic: the
    * "random" score is a seeded hash of the URL, so samples are reproducible
    * across runs and engines. */
  def sampleUrls(frontier: Dataset[FrontierEntry], perDomain: Int, perHost: Int, seed: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val r = xxhash64(col("url"), lit(seed))
    val wd = Window.partitionBy("domain").orderBy(r, col("url"))
    val wh = Window.partitionBy("host").orderBy(r, col("url"))
    frontier.toDF()
      .withColumn("_rd", row_number().over(wd))
      .withColumn("_rh", row_number().over(wh))
      .filter(col("_rd") <= perDomain && col("_rh") <= perHost)
      .select("url", "host", "domain", "status", "score")
  }

  /** Domain statistics (reference DomainStatistics tool). */
  def domainStats(frontier: Dataset[FrontierEntry]): DataFrame =
    frontier.toDF().groupBy(col("domain"))
      .agg(count(lit(1)).as("n_urls"), countDistinct(col("host")).as("n_hosts"),
        sum(col("score")).as("total_score"))
}
