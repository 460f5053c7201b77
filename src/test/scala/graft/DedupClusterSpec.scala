package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.DedupOps

/** Near-dup clustering: connected components over similarity pairs. */
class DedupClusterSpec extends AnyFunSuite with SparkSpecBase {

  private def components(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    DedupOps.connectedComponents(pairs.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap
  }

  /** Reference union-find over the same pairs. */
  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    // min id per component is the canonical label
    val byRoot = nodes.groupBy(find)
    nodes.map(n => n -> byRoot(find(n)).min).toMap
  }

  test("chain, star, cycle, singleton pair") {
    // chain 1-2-3-4; star 10-{11,12,13}; cycle 20-21-22-20; pair 30-31
    val pairs = Seq[(Long, Long)](
      (1, 2), (2, 3), (3, 4),
      (11, 10), (10, 12), (13, 10),
      (20, 21), (21, 22), (22, 20),
      (31, 30))
    val got = components(pairs)
    assert(got == unionFind(pairs))
    assert(got(4L) == 1L && got(13L) == 10L && got(22L) == 20L && got(31L) == 30L)
  }

  test("random graphs agree with union-find (seeded)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 5) {
      val n = 60
      val pairs = Seq.fill(80)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(p => p._1 != p._2)
      assert(components(pairs) == unionFind(pairs))
    }
  }

  test("idempotent: clustering the (doc,cluster) pairs again changes nothing") {
    import spark.implicits._
    val pairs = Seq[(Long, Long)]((5, 3), (3, 9), (100, 7), (7, 5))
    val first = components(pairs)
    val again = DedupOps.connectedComponents(
      first.toSeq.toDF("id_a", "id_b")).as[(Long, Long)].collect().toMap
    // every node labels to the same canonical id (cluster ids label themselves)
    first.foreach { case (n, c) => assert(again(n) == c) }
  }

  test("decontamination: benchmark n-gram leaks flagged, clean docs pass") {
    import spark.implicits._
    val bench = Seq((900L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "intro text then the quick brown fox jumps right here"), // 3 shared 3-grams
      (2L, "quick brown dogs are not foxes at all"),                // 0 shared 3-grams
      (3L, "over the lazy dog it went"),                            // 2 shared 3-grams
      (4L, "the quick start guide")                                 // 1 shared 3-gram ("the quick" is a 2-gram; 3-gram "the quick start" differs) — 0
    ).toDF("doc_id", "text")
    val flagged2 = DedupOps.decontaminate(corpus, bench, 3, 2)
      .as[(Long, Long)].collect().toMap
    assert(flagged2.keySet == Set(1L, 3L), s"minHits=2 flags exactly 1 and 3: $flagged2")
    assert(flagged2(1L) == 3L && flagged2(3L) == 2L)
    // broadcast shape: the benchmark side must hash-join, never shuffle the corpus side twice
    val plan = DedupOps.decontaminate(corpus, bench, 3, 1).queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    assert(plan.contains("BroadcastHashJoin"), s"benchmark side broadcasts:\n$plan")
  }

  test("stratified sampling: scalar xxh64 parity, rates honored, nested samples") {
    import spark.implicits._
    import graft.ops.SampleOps
    // scalar xxh64Long must agree with the engine's own xxhash64 chain
    val ids = Seq(0L, 1L, 42L, -7L, Long.MaxValue, Long.MinValue, 123456789L)
    val fromSpark = ids.toDF("v")
      .select(col("v"), xxhash64(lit(7L), col("v")).as("h")).as[(Long, Long)].collect().toMap
    ids.foreach { v =>
      assert(SampleOps.xxh64Long(v, SampleOps.xxh64Long(7L, 42L)) == fromSpark(v),
        s"xxh64Long parity for $v")
    }
    // rates honored within hash-uniformity tolerance, and nested: the 10%
    // sample is a subset of the 50% sample at the same seed
    val n = 20000L
    val df = spark.range(n).select(col("id").as("doc_id"), lit("en").as("lang"))
    def kept(rate: Double) = SampleOps.stratifiedSample(
      df, "doc_id", "lang", Map("en" -> rate), seed = 7L)
      .select("doc_id").as[Long].collect().toSet
    val half = kept(0.5); val tenth = kept(0.1)
    assert(math.abs(half.size / n.toDouble - 0.5) < 0.02, s"~50%: ${half.size}")
    assert(math.abs(tenth.size / n.toDouble - 0.1) < 0.02, s"~10%: ${tenth.size}")
    assert(tenth.subsetOf(half), "nested: lower rate is a subset at the same seed")
    // unknown stratum falls to defaultRate = 0.0 → dropped
    val other = spark.range(100).select(col("id").as("doc_id"), lit("xx").as("lang"))
    assert(SampleOps.stratifiedSample(other, "doc_id", "lang", Map("en" -> 1.0)).isEmpty)
  }

  test("sequence packing: running-budget bins per stream, deterministic") {
    import spark.implicits._
    import graft.ops.SampleOps
    // one stream (packKeys=1), budget 10: docs of 4,4,4,4 tokens →
    // before = 0,4,8,12 → bins 0,0,0,1; offsets 0,4,8,2
    val docs = Seq((1L, 4L), (2L, 4L), (3L, 4L), (4L, 4L)).toDF("doc_id", "n_tok")
    val got = SampleOps.packSequences(docs, "doc_id", "n_tok", 10L, 1)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L, 0L, 0L), (2L, 0L, 0L, 4L), (3L, 0L, 0L, 8L), (4L, 0L, 1L, 2L)))
    // streams pack independently: same docs over 2 keys
    val two = SampleOps.packSequences(docs, "doc_id", "n_tok", 10L, 2)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (d, k, b, o) => d -> ((k, b, o)) }.toMap
    assert(two(2L) == ((0L, 0L, 0L)) && two(4L) == ((0L, 0L, 4L))) // evens: stream 0
    assert(two(1L) == ((1L, 0L, 0L)) && two(3L) == ((1L, 0L, 4L))) // odds: stream 1
  }

  test("sequence packing: duplicate ids cumsum per ROW, not per orderBy peer group") {
    import spark.implicits._
    import graft.ops.SampleOps
    // two rows share doc_id 1: the ROWS-frame cumsum must give them
    // DISTINCT running offsets (0 and 4); the default RANGE frame would
    // hand both the shared peer total (concat-and-chunk breakage)
    val docs = Seq((1L, 4L), (1L, 4L), (2L, 4L)).toDF("doc_id", "n_tok")
    val got = SampleOps.packSequences(docs, "doc_id", "n_tok", 10L, 1)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val dupRows = got.filter(_._1 == 1L).map(r => (r._3, r._4)).sorted
    assert(dupRows == Seq((0L, 0L), (0L, 4L)), s"per-row cumsum for duplicate ids: $got")
    assert(got.find(_._1 == 2L).get._4 == 8L, s"stream total unaffected: $got")
  }

  test("repetition signals: empty tokens, all-same tokens, run-length edges") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a  b"),        // double space: unigrams drop the empty (1/2); raw bigrams "a ", " b" → 1·2/3
      (2L, "w w w w"),     // all same: 4/4; bigram "w w" 3× → 3·2/4
      (3L, "p q p q p")    // top p 3/5; bigrams p q ×2, q p ×2 → 2·2/5
    ).toDF("doc_id", "text")
    val got = graft.ops.TextOps.repetitionSignals(docs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) == ((500000L, 666666L)), s"got $got")
    assert(got(2L) == ((1000000L, 1500000L)), s"got $got")
    assert(got(3L) == ((600000L, 800000L)), s"got $got")
  }

  test("repetition signals: top-token and top-bigram fractions") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a b"),   // top token a: 3/4; top bigram "a a": 2×2/4 = 1.0
      (2L, "x y"),       // 1/2; "x y": 1×2/2 = 1.0
      (3L, "solo")       // 1/1; no bigram → null
    ).toDF("doc_id", "text")
    val got = graft.ops.TextOps.repetitionSignals(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(got(1L) == ((750000L, 1000000L)))
    assert(got(2L) == ((500000L, 1000000L)))
    assert(got(3L) == ((1000000L, -1L)))
  }

  test("keep-canonical flow: one survivor per near-dup component") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),         // exact dup of 1
      (3L, "alpha beta gamma delta epsilon"), // near 1/2
      (4L, "unrelated text entirely here")
    ).toDF("doc_id", "text")
    val pairs = DedupOps.unigramJaccardPairs(docs, 0.7, maxDfFraction = 1.0)
    val clusters = DedupOps.connectedComponents(pairs)
    val survivors = docs.join(clusters, Seq("doc_id"), "left")
      .filter(col("cluster_id").isNull || col("cluster_id") === col("doc_id"))
      .select("doc_id").as[Long].collect().sorted
    assert(survivors.toSeq == Seq(1L, 4L)) // 2,3 fold into 1; 4 unpaired survives
  }
}
