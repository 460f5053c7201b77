package graft.tools

import graft.fixtures.{RobotsPolicy, SyntheticWeb, WebConfig}

/** Dev-time generator for the q_crawl_round DuckDB oracle fixture tables.
  *
  * The flagship entry() crawls the deterministic 6-host/10-page fixture web;
  * its behavior (robots policy per host, the homepage span lists) is INPUT
  * data — a pure function of the fixture config — which this tool tabulates
  * as SQL VALUES rows. The ENGINE semantics (generate selection, politeness
  * gates, OPIC credit distribution, the updatedb state machine) are NOT
  * tabulated: the oracle SQL in SparkEntry derives them from these inputs
  * from first principles, the same pattern q_parse_html uses for the HTML
  * parser. Run with `sbt "runMain graft.tools.OracleGen"` whenever the
  * fixture config of SparkEntry.entry changes.
  */
object OracleGen {

  def main(args: Array[String]): Unit = {
    val web = SyntheticWeb(WebConfig(nHosts = 6, pagesPerHost = 10))
    // seeds = homepages; outcome from the per-host robots policy (homepages
    // themselves always serve 200 in the fixture)
    val rows = (0 until web.cfg.nHosts).map { h =>
      val host = web.hostName(h)
      val url = web.pageUrl(h, 0)
      val outcome = web.robots(host) match {
        case RobotsPolicy.AllowAll | RobotsPolicy.CrawlDelay(2) => "success"
        case RobotsPolicy.CrawlDelay(_) => "gone"    // > fetcher.max.crawl.delay
        case RobotsPolicy.DenyAll => "gone"
        case RobotsPolicy.Unavailable5xx => "retry"
      }
      (url, host, outcome)
    }
    println("-- pages(url, host, outcome):")
    println(rows.map { case (u, h, o) => s"('$u','$h','$o')" }.mkString(",\n"))

    println("-- counts(from_url, n_all): link+media span count of each SUCCESSFUL homepage")
    val succ = rows.filter(_._3 == "success")
    println(succ.map { case (u, _, _) =>
      val spans = web.render(u).spans.filter(s => Set("link", "media", "redirect")(s.kind))
      s"('$u',${math.max(spans.size, 1)})"
    }.mkString(",\n"))

    println("-- links(from_url, to_url): one row per LINK span instance")
    println(succ.flatMap { case (u, _, _) =>
      web.render(u).spans.filter(_.kind == "link").map(s => s"('$u','${s.media_ref}')")
    }.mkString(",\n"))

    // cross-check: homepage signatures must be pairwise distinct or the
    // oracle must model the dedup marking
    val sigs = succ.map { case (u, _, _) =>
      u -> graft.frontier.TextProfileSigner().signSpans(web.render(u).spans).toSeq
    }
    val dups = sigs.groupBy(_._2).filter(_._2.size > 1)
    println(s"-- duplicate homepage signatures: ${if (dups.isEmpty) "NONE" else dups.values.map(_.map(_._1)).toList}")
  }
}
