package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.cli.CrawlRound
import graft.fixtures.{SyntheticWeb, WebConfig}
import graft.frontier.{CrawlConfig, Dedup, UpdateDbColumnar}
import graft.generate.Generator
import graft.parse.Parse
import graft.schema._
import graft.fetch._
object Scratch {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"STAGE $name%-34s ${(System.nanoTime()-t0)/1e9}%8.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val aqe = args.headOption.getOrElse("true")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    // task listener
    val stages = scala.collection.mutable.LinkedHashMap.empty[Int,(Int,Long,Long)]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = synchronized {
        val (n,tot,mx) = stages.getOrElse(t.stageId,(0,0L,0L))
        stages(t.stageId) = (n+1, tot + t.taskInfo.duration, math.max(mx, t.taskInfo.duration))
      }
    })
    def dumpStages(tag: String): Unit = synchronized {
      println(s"TASKS[$tag]: " + stages.toSeq.sortBy(-_._2._2).take(6).map{case (id,(n,tot,mx)) => s"st$id(n=$n,tot=${tot}ms,max=${mx}ms)"}.mkString(" "))
      stages.clear()
    }
    println("AQE=" + aqe)
    val web = SyntheticWeb(WebConfig(nHosts = 3000, pagesPerHost = 350, hotFactor = 25))
    val cfg = CrawlConfig(topN = 800000, maxPerHost = 500, numFetchPartitions = 32,
      serverDelayMs = 5000, fetchLatencyMs = 50)
    val root = java.nio.file.Files.createTempDirectory("graft-prof").toString
    val store = new graft.store.SnapshotStore(root)
    val now = 1700000000000L
    t("inject")(CrawlRound.inject(spark, store, web.urls(spark), cfg, now))
    val fetcher = SyntheticFetcher(web, cfg.fetchLatencyMs)
    val frontier = store.load(spark, "frontier").get.as[FrontierEntry]
    val (fl0, marked) = Generator.generate(frontier, cfg, now, 1)
    val fetchlist = fl0.persist(StorageLevel.MEMORY_AND_DISK)
    val pages = fetchlist.mapPartitions { it =>
      PolitenessExecutor.run(0, it, fetcher, cfg, now, 1, _ => ())
    }.persist(StorageLevel.MEMORY_AND_DISK)
    t("fetch(materialize)")(pages.count())
    val fu = Parse.fetchUpdates(pages)
    val lu = Parse.linkedUpdates(pages, cfg, 1)
    val nf = UpdateDbColumnar.run(marked, fu, lu, cfg, now).persist(StorageLevel.MEMORY_AND_DISK)
    t("updatedb PLAN only")(nf.queryExecution.executedPlan)
    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    }
    val gc0 = gcMs
    dumpStages("before-updatedb")
    t("updatedb EXEC (materialize)")(nf.count())
    dumpStages("updatedb")
    println(s"GC during updatedb: ${gcMs - gc0} ms")
    val dd = Dedup.markDuplicates(nf)
    t("dedup PLAN only")(dd.queryExecution.executedPlan)
    t("dedup+write")(store.commit("frontier", dd.toDF(), 1))
    dumpStages("dedup")
    spark.stop()
  }
}
