package graft.frontier

import org.apache.spark.sql.{Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.schema.{CrawlStatus, FrontierEntry}

/** Signature-based duplicate marking (SURVEY.md §2.4 "Dedup group-reduce").
  *
  * Semantics from the reference dedup job
  * (reference/src/java/org/apache/nutch/crawl/DeduplicationJob.java:147-272):
  * group fetched pages by content signature; keep the "best" row — highest
  * score, then most recent fetch, then https over http, then shortest URL —
  * and mark every other row db_duplicate. Realized as one window (partition
  * by signature, ordered by the comparator chain) + row_number, which Spark
  * executes as a single shuffle with partial sort — no co-group needed.
  */
object Dedup {

  def markDuplicates(frontier: Dataset[FrontierEntry], byDomain: Boolean = false): Dataset[FrontierEntry] = {
    val spark = frontier.sparkSession
    import spark.implicits._

    val fetched = col("status") === CrawlStatus.DB_FETCHED || col("status") === CrawlStatus.DB_NOTMODIFIED
    val keyCols = if (byDomain) Seq(col("signature"), col("domain")) else Seq(col("signature"))
    val w = Window.partitionBy(keyCols: _*).orderBy(
      desc("score"),
      desc("fetch_time"),
      // https preferred over http
      when(col("url").startsWith("https://"), 0).otherwise(1).asc,
      length(col("url")).asc,
      col("url").asc // deterministic total tiebreak
    )

    // Only fetched rows with a signature enter the window — the null-signature
    // mass (unfetched/gone) would otherwise form one giant skewed partition.
    val isCandidate = fetched && col("signature").isNotNull
    val candidates = frontier.toDF().filter(isCandidate)
    val rest = frontier.toDF().filter(!isCandidate)

    val marked = candidates
      .withColumn("_dup_rn", row_number().over(w))
      .withColumn("status",
        when(col("_dup_rn") > 1, lit(CrawlStatus.DB_DUPLICATE)).otherwise(col("status")))
      .drop("_dup_rn")

    marked.unionByName(rest).as[FrontierEntry]
  }
}
