package graft.seen

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  *  - mightContain == true   ⇒ maybe seen → exact resolution against the
  *    frontier for just that (fpp-bounded) slice.
  *
  * Lifecycle in the round loop (see CrawlRound): built once at inject,
  * persisted as a SnapshotStore blob, loaded + broadcast each round, and
  * MERGED (bitwise OR of equal-shaped filters) with a per-round bloom built
  * over the round's update side (discovered links ∪ fetch results) — never
  * by re-scanning the frontier. The filter is a SUPERSET of all URLs ever
  * seen (purged rows stay in), which is exactly the URL-seen semantics; a
  * false positive or a stale superset entry only routes a row through the
  * exact join path, never drops it.
  *
  * Scale: `df.stat.bloomFilter` aggregates per-partition filters and merges
  * on the driver — ~1.2 GB bits at 10^9 items / 1% fpp. Beyond that, shard
  * by hash prefix (k independent blooms, each broadcast to the executors
  * that own that prefix) — documented scale path; the envelope format below
  * already carries capacity for that decision. Saturation (inserted >
  * capacity) degrades fpp, not correctness; the round loop rebuilds from
  * the frontier at 2× capacity when the insert counter crosses capacity.
  */
object UrlSeen {

  case class SeenFilter(bloom: Broadcast[BloomFilter], expectedItems: Long,
                        fpp: Double, approxInserted: Long) {
    def mightContain(h: Long): Boolean = bloom.value.mightContainLong(h)
    def saturated: Boolean = approxInserted > expectedItems
    /** Release the broadcast's executor + driver storage AND the filter's
      * temp-function registration (a long crawl would otherwise accumulate
      * one registry entry per round, each pinning a destroyed broadcast
      * handle). The round loop calls this on every superseded filter so a
      * crawl holds exactly one live bloom broadcast (the blob on the
      * SnapshotStore is the durable copy). */
    def destroy(): Unit = {
      UrlSeen.dropRegistration(bloom.id)
      bloom.destroy()
    }
  }

  /** Build + broadcast the bloom over a url_hash column. */
  def build(frontier: DataFrame, expectedItems: Long, fpp: Double,
            approxInserted: Long = -1L): SeenFilter = {
    val spark = frontier.sparkSession
    val bf = frontier.stat.bloomFilter("url_hash", expectedItems, fpp)
    val n = if (approxInserted >= 0) approxInserted else 0L
    SeenFilter(spark.sparkContext.broadcast(bf), expectedItems, fpp, n)
  }

  /** Merge `updates` (url_hash column; the round's discovered ∪ fetched
    * URLs — update-sized, NOT frontier-sized) into the existing filter.
    * Returns a NEW broadcast over a NEW filter: the old filter is merged
    * INTO the round-local `add` (equal capacity/fpp shapes OR together), so
    * the live broadcast's value is never mutated — any in-flight plan still
    * holding the old SeenFilter keeps observing exactly the pre-merge bits.
    * The caller is responsible for `destroy()`ing the superseded filter once
    * its last consumer has materialized (CrawlRound does, after blob commit). */
  def merged(spark: SparkSession, seen: SeenFilter, updates: DataFrame,
             updateCount: Long): SeenFilter = {
    if (updates.isEmpty) return seen // stat.bloomFilter NPEs on zero rows
    val add = updates.stat.bloomFilter("url_hash", seen.expectedItems, seen.fpp)
    add.mergeInPlace(seen.bloom.value) // mutates only the round-local filter
    SeenFilter(spark.sparkContext.broadcast(add), seen.expectedItems, seen.fpp,
      seen.approxInserted + updateCount)
  }

  // ---- in-session broadcast cache ----
  //
  // At 10^9 URLs the filter is ~1.2 GB: re-reading the blob and re-broadcasting
  // it EVERY round is O(bloom) I/O + network where the round's delta is tiny.
  // Sequential rounds in one session instead reuse the live broadcast: the
  // cache holds at most ONE filter per store root, keyed by the committed
  // blob's identity (path + commit timestamp) so any out-of-band blob change
  // (resetTo replay, Bench blob restore, another writer) safely misses and
  // reloads. Superseded filters are destroyed on replacement — a crawl session
  // holds at most one live bloom broadcast per store.
  private final case class CacheKey(path: String, committedAtMs: Long)
  private val sessionCache =
    new java.util.concurrent.ConcurrentHashMap[String, (CacheKey, SeenFilter)]()
  private[graft] val cacheHits = new java.util.concurrent.atomic.AtomicLong(0)

  /** The cached filter for this store root, iff it matches the committed
    * blob identity. */
  def cachedFor(root: String, blobPath: String, committedAtMs: Long): Option[SeenFilter] = {
    Option(sessionCache.get(root)).collect {
      case (k, sf) if k == CacheKey(blobPath, committedAtMs) =>
        cacheHits.incrementAndGet(); sf
    }
  }

  /** Install `sf` as the root's cached filter; destroys the displaced one
    * (unless it IS `sf`'s broadcast). */
  def cacheFor(root: String, blobPath: String, committedAtMs: Long, sf: SeenFilter): Unit = {
    val prev = sessionCache.put(root, (CacheKey(blobPath, committedAtMs), sf))
    prev match {
      case (_, old) if !(old.bloom eq sf.bloom) => old.destroy()
      case _ =>
    }
  }

  /** Drop (and destroy) the root's cached filter, if any. */
  def invalidate(root: String): Unit = {
    val prev = sessionCache.remove(root)
    if (prev != null) prev._2.destroy()
  }

  // ---- blob (SnapshotStore) serialization: versioned envelope ----
  private val Magic = 0x47424c4d // "GBLM"

  def toBytes(seen: SeenFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(Magic)
    out.writeInt(1) // version
    out.writeLong(seen.expectedItems)
    out.writeDouble(seen.fpp)
    out.writeLong(seen.approxInserted)
    seen.bloom.value.writeTo(out)
    out.flush()
    bos.toByteArray
  }

  def fromBytes(spark: SparkSession, bytes: Array[Byte]): SeenFilter = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    require(in.readInt() == Magic, "not a url-seen bloom blob")
    require(in.readInt() == 1, "unknown url-seen blob version")
    val expected = in.readLong()
    val fpp = in.readDouble()
    val inserted = in.readLong()
    val bf = BloomFilter.readFrom(in)
    SeenFilter(spark.sparkContext.broadcast(bf), expected, fpp, inserted)
  }

  /** Codegen'd bloom-membership probe (native Catalyst expression, not a
    * UDF): registered per filter under a broadcast-unique name so lazily
    * analyzed plans never observe a later filter's builder. The registration
    * is tracked and dropped when the filter is destroyed — the registry
    * stays flat across rounds instead of accumulating one dead entry per
    * superseded broadcast. */
  def mightContainCol(spark: SparkSession, seen: SeenFilter, c: Column): Column = {
    val name = s"graft_seen_mc_${seen.bloom.id}"
    registrations.put(seen.bloom.id, (spark, name))
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(name,
      (es: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.BloomMightContainLong(es.head, seen.bloom),
      "built-in")
    call_function(name, c)
  }

  // broadcast id → (session, registered temp-function name); entries removed
  // (and the function dropped) when the owning filter is destroyed
  private val registrations =
    new java.util.concurrent.ConcurrentHashMap[Long, (SparkSession, String)]()

  private[seen] def dropRegistration(broadcastId: Long): Unit = {
    val reg = registrations.remove(broadcastId)
    if (reg != null) {
      val (spark, name) = reg
      try spark.sessionState.functionRegistry.dropFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name))
      catch { case _: Exception => () } // session already stopped: nothing to drop
    }
  }

  /** Live probe registrations (test observability: must stay ≤ live filters). */
  def registrationCount: Int = registrations.size

  /** Split candidates (must carry url_hash) into definitely-new rows plus the
    * exactly-resolved maybe-seen survivors. `frontierKeys` is the frontier
    * projected to url_hash (column pruning keeps the scan 8 bytes/row). */
  def filterUnseen(candidates: DataFrame, seen: SeenFilter, frontierKeys: DataFrame): DataFrame = {
    val spark = candidates.sparkSession
    val mightContain = mightContainCol(spark, seen, col("url_hash"))
    val definitelyNew = candidates.filter(!mightContain)
    val maybeSeen = candidates.filter(mightContain)
    val resolved = maybeSeen.join(frontierKeys.select(col("url_hash")).distinct(),
      Seq("url_hash"), "left_anti")
    definitelyNew.unionByName(resolved)
  }
}
