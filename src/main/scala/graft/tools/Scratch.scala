package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    import graft.functions.GraftFunctions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val urls = docs.selectExpr("concat('HTTP://Host-', cast(doc_id % 7 as string), '.Example.COM:80/', source, '/../', source, '/?id=', doc_id, '&PHPSESSID=zz#frag') AS raw")
    val out = urls.select(col("raw"), url_canonicalize(col("raw")).as("canon"))
      .withColumn("host", url_host(col("canon")))
      .withColumn("domain", url_domain(col("host")))
      .withColumn("h64", url_hash64(col("canon")))
      .withColumn("ok", url_accept(col("canon")))
    out.show(5, false)
    out.explain("formatted")
    println("distinct canon count = " + out.select("canon").distinct.count)
    println("SQL surface: " + spark.sql("SELECT url_canonicalize('HTTP://A.B.Co.UK:80//x//./y/?sid=1&q=2') c").collect.head.getString(0))
    spark.stop()
  }
}
