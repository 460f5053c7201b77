package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling for data-mixing pipelines.
  *
  * A training run samples strata (languages, sources, quality bands) at
  * different rates; the selection must be REPRODUCIBLE across runs,
  * cluster sizes, and partitionings — `rand()` is none of those. Here the
  * keep decision is a pure function of (seed, row id): bucket =
  * pmod(xxhash64(seed, id), 10^6), keep iff bucket < rate·10^6 for the
  * row's stratum. One codegen'd map-side filter — no shuffle, no sort, no
  * state; changing one stratum's rate only grows/shrinks that stratum's
  * kept set monotonically (nested samples, the property quota tuning
  * needs).
  */
object SampleOps {

  /** Spark's XXH64 long-input hash (catalyst XXH64.hashLong semantics) —
    * used to pre-fold the seed literal driver-side so the DuckDB oracle
    * needs a single long-hash chain; spec-verified against the engine's
    * own `xxhash64`. */
  def xxh64Long(v: Long, seed: Long): Long = {
    val P1 = 0x9E3779B185EBCA87L
    val P2 = 0xC2B2AE3D27D4EB4FL
    val P3 = 0x165667B19E3779F9L
    val P4 = 0x85EBCA77C2B2AE63L
    val P5 = 0x27D4EB2F165667C5L
    var h = seed + P5 + 8L
    var k = v * P2
    k = java.lang.Long.rotateLeft(k, 31)
    k *= P1
    h ^= k
    h = java.lang.Long.rotateLeft(h, 27) * P1 + P4
    h ^= h >>> 33; h *= P2; h ^= h >>> 29; h *= P3; h ^= h >>> 32
    h
  }

  /** Sampling bucket in [0, 10^6): pmod(xxhash64(seed, id), 10^6). The
    * two-arg chain (seed literal first) gives an independent hash family
    * per seed — re-sampling with a new seed is uncorrelated. */
  def sampleBucket(id: Column, seed: Long): Column =
    pmod(xxhash64(lit(seed), id.cast("long")), lit(1000000L))

  /** Sequence PACKING (concat-and-chunk): assign documents to fixed
    * token-budget bins for training-sequence assembly. Documents are
    * spread over `packKeys` independent streams by doc-id hash
    * (`pmod(id, packKeys)`), and within each stream packed in doc-id
    * order by running token count: bin = floor(tokens_before / budget)
    * — the standard concat-then-chunk policy (a document may straddle a
    * bin boundary; `bin_offset` says where it starts inside its bin).
    *
    * Scale shape: one shuffle keyed by pack_key + a sort-within-stream
    * window cumsum. `packKeys` bounds the window size (corpus/packKeys
    * docs per stream) and is the parallelism knob — at 10^10 docs use
    * thousands of keys; every stream packs independently and
    * deterministically (same input → same bins at any cluster size). */
  def packSequences(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      budget: Long,
      packKeys: Int = 32): DataFrame = {
    // explicit ROWS frame: the default RANGE frame would share one cumsum
    // across orderBy peers (duplicate ids), diverging from concat-and-chunk
    // semantics; ROWS is also what the DuckDB oracle states
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pack_key")).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("pack_key", pmod(col(idCol).cast("long"), lit(packKeys.toLong)))
      .withColumn("_before",
        coalesce(sum(col(tokenCol)).over(w) - col(tokenCol), lit(0L)))
      .select(col(idCol), col("pack_key"),
        // integer long division: exact at any cumulative count (a double
        // cast loses exactness past 2^53 tokens per stream)
        expr(s"_before DIV ${budget}L").as("bin_id"),
        (col("_before") % budget).as("bin_offset"))
  }

  /** Keep each row iff its bucket < rate(stratum)·10^6; strata missing
    * from `rates` fall to `defaultRate`. Emits the bucket as
    * `sample_bucket` (lineage: WHY a row was kept is auditable). */
  def stratifiedSample(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 0.0,
      seed: Long = 42L): DataFrame = {
    val ppm: Map[String, Long] = rates.map { case (k, v) => k -> math.round(v * 1000000L) }
    val thr = coalesce(
      element_at(typedLit(ppm), col(stratumCol)),
      lit(math.round(defaultRate * 1000000L)))
    df.withColumn("sample_bucket", sampleBucket(col(idCol), seed))
      .filter(col("sample_bucket") < thr)
  }
}
