package graft.tools

import org.apache.spark.sql.SparkSession

/** Working verification driver (edited per change under test). Currently:
  * round-5 plan audits — q_adaptive_sort must be a single
  * WholeStageCodegen project over a pruned parquet scan (no UDF, no
  * shuffle); the adaptive generator sort must keep the generate plan's
  * shape (exchange → sort within partitions, sort key folded into the
  * same codegen stage). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    val dir = "/root/testdata/sf0.001"
    println("===== q_adaptive_sort plan =====")
    val q = graft.SparkEntry.queries("q_adaptive_sort")(spark, dir)
    q.explain("formatted")
    println("rows=" + q.count())

    println("===== adaptive generate plan =====")
    import spark.implicits._
    import graft.schema.{CrawlStatus, FrontierEntry}
    val now = 1700000000000L
    val f = (1 to 1000).map { i =>
      val url = s"http://h${i % 20}.test/p$i"
      val host = graft.url.Urls.hostOf(url)
      FrontierEntry(url, graft.url.Urls.hash64(url), host,
        graft.url.Urls.registeredDomainOf(host), CrawlStatus.DB_UNFETCHED,
        now - (i % 30) * 86400000L, i % 3, 2592000, (i % 7) / 2.0f,
        null, 0L, null, -1L, Map.empty)
    }.toDS()
    val cfg = graft.frontier.CrawlConfig(scoringAdaptive = true, topN = 100,
      numFetchPartitions = 4,
      adaptiveStatusSort = Map(CrawlStatus.DB_UNFETCHED.toInt -> 0.1))
    val (tasks, _) = graft.generate.Generator.generate(f, cfg, now, 1)
    tasks.explain("formatted")
    println("tasks=" + tasks.count())
    spark.stop()
  }
}
