package graft.seen

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** URL-seen set (north rule: broadcast-merged bloom filter over
  * canonicalized-URL 64-bit hashes).
  *
  * Functionally replaces the reference's "join every discovered URL against
  * the whole CrawlDb" (which it does implicitly inside the updatedb
  * co-group). At 10^10 URLs the exact join is the bottleneck; the bloom
  * prefilter resolves the common case without touching the frontier:
  *
  *  - mightContain == false  ⇒ definitely NEW (bloom has no false negatives)
  *  - mightContain == true   ⇒ maybe seen → exact left-anti join against the
  *    frontier for just that (small, fpp-bounded) slice.
  *
  * Build path: `df.stat.bloomFilter` aggregates per-partition filters and
  * merges on the driver — fine up to ~10^8 bits; beyond that, raise fpp or
  * shard by hash prefix (documented scale path).
  */
object UrlSeen {

  case class SeenFilter(bloom: Broadcast[BloomFilter]) {
    def mightContain(h: Long): Boolean = bloom.value.mightContainLong(h)
  }

  /** Build + broadcast the bloom over the frontier's url_hash column. */
  def build(frontier: DataFrame, expectedItems: Long, fpp: Double): SeenFilter = {
    val spark = frontier.sparkSession
    val bf = frontier.stat.bloomFilter("url_hash", expectedItems, fpp)
    SeenFilter(spark.sparkContext.broadcast(bf))
  }

  /** Split candidates (must carry url_hash) into definitely-new rows plus the
    * exactly-resolved maybe-seen survivors. `frontierKeys` is the frontier
    * projected to url_hash (column pruning keeps the scan 8 bytes/row). */
  def filterUnseen(candidates: DataFrame, seen: SeenFilter, frontierKeys: DataFrame): DataFrame = {
    val spark = candidates.sparkSession
    val bloomBc = seen.bloom
    val mightContain = udf((h: Long) => bloomBc.value.mightContainLong(h))
    val definitelyNew = candidates.filter(!mightContain(col("url_hash")))
    val maybeSeen = candidates.filter(mightContain(col("url_hash")))
    val resolved = maybeSeen.join(frontierKeys.select(col("url_hash")).distinct(),
      Seq("url_hash"), "left_anti")
    definitelyNew.unionByName(resolved)
  }
}
