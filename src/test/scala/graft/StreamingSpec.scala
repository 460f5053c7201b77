package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming shape of the incremental pipeline (SURVEY.md §2.11):
  * the same windowed aggregation the batch query runs, driven as a stream
  * with a watermark — proves the engine's operators compose under
  * readStream/writeStream (each crawl round is the batch twin of this). */
class StreamingSpec extends AnyFunSuite with SparkSpecBase {

  test("windowed streaming aggregation over events matches the batch result") {
    val dir = "/root/testdata/sf0.001"
    val schema = spark.read.parquet(s"$dir/events.parquet").schema

    // FileStreamSource needs a directory; stage the single parquet file
    val streamDir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))

    val stream = spark.readStream.schema(schema).parquet(streamDir.toString)
      .withColumn("ts", col("ts").cast("timestamp")) // NTZ → event-time type
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))

    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("ev_stream")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("ev_stream")
    val batch = spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))

    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("streaming seed ingestion merges new seed files into the frontier") {
    import graft.frontier.CrawlConfig
    import graft.store.SnapshotStore
    import graft.streaming.StreamingInject

    val cfg = CrawlConfig()
    val now = 1700000000000L
    val seedDir = java.nio.file.Files.createTempDirectory("graft-seeds")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-seed-ckpt").toString
    val store = new SnapshotStore(java.nio.file.Files.createTempDirectory("graft-sstore").toString)

    java.nio.file.Files.writeString(seedDir.resolve("batch1.txt"),
      "http://a.fix.test/\nhttp://b.fix.test/\tnutch.score=5\n# comment\n")
    val q1 = StreamingInject.start(spark, store, seedDir.toString, cfg, now, ckpt, availableNow = true)
    q1.awaitTermination(120000)
    val f1 = store.load(spark, "frontier").get
    assert(f1.count() == 2)

    // a second seed file arrives: known URLs keep state, new ones enter
    java.nio.file.Files.writeString(seedDir.resolve("batch2.txt"),
      "http://b.fix.test/\nhttp://c.fix.test/\n")
    val q2 = StreamingInject.start(spark, store, seedDir.toString, cfg, now, ckpt, availableNow = true)
    q2.awaitTermination(120000)
    val f2 = store.load(spark, "frontier").get.collect()
      .map(r => r.getAs[String]("url") -> r.getAs[Float]("score")).toMap
    assert(f2.keySet == Set("http://a.fix.test/", "http://b.fix.test/", "http://c.fix.test/"))
    assert(f2("http://b.fix.test/") == 5.0f) // existing row kept, not overwritten
  }
}
