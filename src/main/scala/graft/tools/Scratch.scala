package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.cli.CrawlRound
import graft.fixtures.{SyntheticWeb, WebConfig}
import graft.frontier.{CrawlConfig, Dedup, UpdateDb}
import graft.generate.Generator
import graft.parse.Parse
import graft.schema._
import graft.fetch._
object Scratch {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"STAGE $name%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val web = SyntheticWeb(WebConfig(nHosts = 3000, pagesPerHost = 350, hotFactor = 25))
    val cfg = CrawlConfig(topN = 800000, maxPerHost = 500, numFetchPartitions = cpus,
      serverDelayMs = 5000, fetchLatencyMs = 50)
    val root = java.nio.file.Files.createTempDirectory("graft-prof").toString
    val store = new graft.store.SnapshotStore(root)
    val now = 1700000000000L
    t("inject")(CrawlRound.inject(spark, store, web.urls(spark), cfg, now))
    val fetcher = SyntheticFetcher(web, cfg.fetchLatencyMs)
    val frontier = store.load(spark, "frontier").get.as[FrontierEntry]
    val (fl0, marked) = Generator.generate(frontier, cfg, now, 1)
    val fetchlist = fl0.persist(StorageLevel.MEMORY_AND_DISK)
    t("generate(materialize)")(fetchlist.count())
    val pages = fetchlist.mapPartitions { it =>
      PolitenessExecutor.run(0, it, fetcher, cfg, now, 1, _ => ())
    }.persist(StorageLevel.MEMORY_AND_DISK)
    t("fetch(materialize)")(pages.count())
    t("write fetched")(store.commit("fetched", pages.toDF().drop("spans"), 1))
    t("write parsed")(store.commit("parsed", Parse.parsedDocs(pages).toDF(), 1))
    val fu = Parse.fetchUpdates(pages)
    val lu = Parse.linkedUpdates(pages, cfg, 1)
    locally {
      import graft.functions.GraftFunctions
      GraftFunctions.register(spark)
      val exploded = pages.toDF()
        .filter(col("status").isin(0x21, 0x24, 0x23))
        .select(col("url").as("from_url"), col("host").as("from_host"), col("score"), col("fetch_time"),
          slice(filter(col("spans"), s => s.getField("kind").isin("link", "media", "redirect")), 1, 100).as("links"))
        .withColumn("n", greatest(size(col("links")), lit(1)))
        .select(col("from_url"), col("from_host"), col("score"), col("fetch_time"), col("n"), explode(col("links")).as("l"))
      t("explode only")(println("exploded=" + exploded.count()))
      val canon = exploded.withColumn("to_url", call_function("url_canon_filter", col("l.media_ref")))
        .filter(col("to_url").isNotNull && col("to_url") =!= col("from_url"))
      t("canon+filter")(println("canon=" + canon.count()))
      val perLink = canon.withColumn("to_host", call_function("url_host", col("to_url")))
        .withColumn("child_score", col("score") / col("n"))
        .select(col("to_url"), col("fetch_time"), col("child_score"))
      val agg0 = perLink.groupBy(col("to_url")).agg(sum(col("child_score")).as("credit"), count(lit(1)).as("n_links"), max(col("fetch_time")).as("fetch_time"))
      t("agg")(println("agg=" + agg0.count()))
    }
    t("linked(count)")(println("linked=" + lu.count()))
    val nf = UpdateDb.run(marked, fu, lu, cfg, now)
    val nfp = nf.persist(StorageLevel.MEMORY_AND_DISK)
    t("updatedb(materialize)")(nfp.count())
    val dd = Dedup.markDuplicates(nfp)
    t("dedup+write frontier")(store.commit("frontier", dd.toDF(), 1))
    spark.stop()
  }
}
