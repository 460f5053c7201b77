package graft.frontier

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.fetch.Fetcher
import graft.schema.FrontierEntry
import graft.url.UrlFilters

/** Sitemap processing (reference util/SitemapProcessor.java: an optional
  * bin/crawl stage that reads hosts from the CrawlDb/HostDb, fetches each
  * host's sitemaps as advertised by robots.txt, and bulk-injects the listed
  * URLs into the CrawlDb).
  *
  * Spark realization: distinct hosts off the frontier → partition-local
  * sitemap discovery (robots `Sitemap:` lines via the fetcher's robots
  * cache) and fetch → link-span extraction → canonicalize + filter →
  * inject-merge (known URLs keep their crawl state, new URLs enter as
  * db_unfetched with the configured sitemap score). Everything between the
  * two shuffles (host distinct, inject co-group) is partition-local.
  */
object Sitemaps {

  /** URLs listed by the sitemaps of the given hosts (canonicalized,
    * filtered, distinct). */
  def discover(hosts: Dataset[String], fetcher: Fetcher, cfg: CrawlConfig): Dataset[String] = {
    val spark = hosts.sparkSession
    import spark.implicits._
    hosts.mapPartitions { it =>
      it.flatMap { host =>
        fetcher.robotsRules(host).toSeq.flatMap(_.sitemaps).flatMap { sm =>
          val resp = fetcher.fetch(sm)
          // raw-content protocols go through the mime registry (sitemap XML
          // → <loc> link spans via XmlDocParser); span protocols serve
          // link spans directly
          val spans =
            if (resp.code != "SUCCESS") Seq.empty
            else if (resp.content != null)
              graft.parse.DocParsers.parseSpans(resp.contentType, sm, resp.content, cfg)
            else if (resp.doc != null) resp.doc.spans
            else Seq.empty
          spans.iterator
            .filter(s => s.kind == "link" && s.media_ref != null)
            .map(s => UrlFilters.canonicalizeAndFilter(s.media_ref))
            .filter(u => u != null && cfg.extraUrlFilters.forall(_.accept(u)))
            .toSeq
        }
      }
    }.distinct()
  }

  /** Full stage: frontier hosts → sitemap URLs → inject-merge. Returns the
    * merged frontier (caller commits). `sitemapScore` mirrors the
    * reference's db.score.sitemap-style seeding for sitemap-discovered URLs. */
  def process(
      frontier: Dataset[FrontierEntry],
      fetcher: Fetcher,
      cfg: CrawlConfig,
      now: Long,
      sitemapScore: Float = 0.5f
  ): Dataset[FrontierEntry] = {
    val spark = frontier.sparkSession
    import spark.implicits._
    val hosts = frontier.select(col("host")).distinct().as[String]
    val urls = discover(hosts, fetcher, cfg)
    // seed-line form feeds the standard inject merge (known rows unchanged)
    val seedLines = urls.map(u => s"$u\tnutch.score=$sitemapScore")
    Inject.run(frontier, seedLines, cfg, now)
  }
}
