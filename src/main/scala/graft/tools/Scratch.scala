package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.frontier.CrawlConfig
import graft.generate.Generator
import graft.schema.{CrawlStatus, FrontierEntry}
import graft.url.Urls
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val now = 1700000000000L
    def entry(url: String, score: Float): FrontierEntry = {
      val host = Urls.hostOf(url)
      FrontierEntry(url, Urls.hash64(url), host, Urls.registeredDomainOf(host),
        CrawlStatus.DB_UNFETCHED, now - 1000, 0, 2592000, score, null, 0L, null, -1L, Map.empty)
    }
    val frontier = (1 to 400).map(i => entry(s"http://hot.example.com/p$i", i.toFloat)).toDS()
    val cfg = CrawlConfig(topN = 10000, numFetchPartitions = 8, maxPerHost = 1000)
    val (list, _) = Generator.generate(frontier, cfg, now, 1, hostSalt = Map("hot.example.com" -> 4))
    list.withColumn("pid", spark_partition_id()).groupBy("pid").count().show()
    // raw key values
    frontier.select(Generator.partitionKey(col("url"), col("host"), Map("hot.example.com" -> 4)).as("k")).distinct().show()
    spark.stop()
  }
}
