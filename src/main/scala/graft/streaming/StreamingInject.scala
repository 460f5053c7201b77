package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.cli.CrawlRound
import graft.frontier.CrawlConfig
import graft.store.{SnapshotStore, TableStore}

/** Streaming seed ingestion: watch a directory of seed-list files and merge
  * each micro-batch into the frontier through the same Inject cogroup the
  * batch path uses (foreachBatch = the incremental-batch bridge).
  *
  * This is the Structured-Streaming face of the reference's inject tool:
  * dropping a new seed file is the reference's `bin/nutch inject <dir>`
  * re-run; here it is continuous, exactly-once per micro-batch, and commits
  * the same atomic frontier snapshots the round loop reads (SURVEY.md §2.11:
  * rounds and streams share one incremental-batch shape).
  */
object StreamingInject {

  /** Start (or one-shot with Trigger.AvailableNow) the seed watcher. */
  def start(
      spark: SparkSession,
      store: TableStore,
      seedDir: String,
      cfg: CrawlConfig,
      now: Long,
      checkpointDir: String,
      availableNow: Boolean = false
  ): StreamingQuery = {
    val lines = spark.readStream.textFile(seedDir)
    val writer = lines.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[String], batchId: Long) =>
        if (!batch.isEmpty) {
          CrawlRound.inject(spark, store, batch, cfg, now)
        }
        ()
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }
}
