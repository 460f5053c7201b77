package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for training-data pipelines.
  *
  * Four tiers, trading exactness for scale:
  *  - exact:        hash-groupBy on content digest — one shuffle.
  *  - unigramJaccard: exact set-similarity via token inverted index —
  *    the oracle-mirrorable baseline (quadratic only within shared tokens).
  *  - minhashLsh:   MinHash signatures + banded LSH buckets — candidates
  *    are verified against exact shingle Jaccard; this is the 100 TB path:
  *    cost is O(docs × hashes) + bucket-local joins, never all-pairs.
  *  - simhash:      64-bit fingerprints + chunk-banding for hamming ≤ k —
  *    near-dup at one long per doc.
  */
object DedupOps {

  /** persist unless this exact plan is already cached — re-persisting an
    * already-cached plan is a no-op that spams CacheManager warnings when
    * two queries share a lineage (e.g. clusters over the pair graph). */
  private def persistSpillable(df: DataFrame): DataFrame =
    if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else df

  /** Exact duplicate groups by content digest. */
  def exactDups(docs: DataFrame): DataFrame =
    docs
      .groupBy(md5(col("text")).as("sig"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n"))
      .filter(col("n") > 1)

  /** Distinct (doc_id, token) pairs of whitespace tokens. */
  def docTokens(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(split(trim(col("text")), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .distinct()

  /** Document-frequency cut: drop tokens/shingles present in more than
    * maxDfFraction × nDocs documents BEFORE an inverted-index self-join.
    *
    * Without it the self-join is quadratic in the hottest key: one
    * boilerplate shingle shared by a million pages joins 10^6 × 10^6 rows.
    * Ubiquitous terms contribute almost nothing to Jaccard (they appear in
    * both sets of nearly every pair), so cutting them bounds the join while
    * barely moving scores — the standard df/positional-filtering trade.
    *
    * NOT silent: the dropped-term count is surfaced on a named spark
    * accumulator (`dedup_df_cut_dropped_<keyCol>`) and returned via the
    * optional callback. maxDfFraction >= 1.0 disables the cut (df can never
    * exceed nDocs), skipping the extra df pass entirely. The hot set is by
    * construction tiny (high df ⇒ few distinct terms), hence broadcast. */
  private def dfCut(items: DataFrame, nDocs: => Long, keyCol: String,
                    maxDfFraction: Double,
                    onDropped: Long => Unit): DataFrame = {
    if (maxDfFraction >= 1.0) return items // nDocs (a count job) never evaluated
    val spark = items.sparkSession
    val maxDf = maxDfFraction * nDocs
    // the hot set is mathematically bounded tiny: Σ df = total distinct
    // (doc, term) occurrences, so at most avgTermsPerDoc / maxDfFraction
    // terms can exceed the cut — collect to the driver (same discipline as
    // HostDb.hotHostSalt) instead of persisting a second dataset
    val hotKeys = items.groupBy(keyCol).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)
      .select(keyCol)
      .collect().map(_.getString(0))
    val dropped = hotKeys.length.toLong
    spark.sparkContext.longAccumulator(s"dedup_df_cut_dropped_$keyCol").add(dropped)
    onDropped(dropped)
    if (dropped == 0L) items
    else {
      import spark.implicits._
      val hot = spark.createDataset(hotKeys.toSeq).toDF(keyCol)
      items.join(broadcast(hot), Seq(keyCol), "left_anti")
    }
  }

  /** Exact unigram-Jaccard pairs ≥ threshold (a < b). Inverted-index join:
    * only documents sharing a token ever meet; tokens above the df cut are
    * dropped first (see [[dfCut]] — the 100 TB hot-key guard). */
  def unigramJaccardPairs(docs: DataFrame, threshold: Double,
                          maxDfFraction: Double = 0.5,
                          onDropped: Long => Unit = _ => ()): DataFrame = {
    val toks0 = persistSpillable(docTokens(docs))
    val toks = dfCut(toks0, docs.count(), "token", maxDfFraction, onDropped)
    val sizes = toks.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = toks.as("a")
      .join(toks.as("b"), col("a.token") === col("b.token") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Exploded (doc_id, shingle-string) pairs WITHOUT the distinct — the
    * shared scan for consumers that dedup later (or not at all). Shingling
    * runs through the codegen'd TextShingles kernel (one byte scan per doc)
    * instead of the former transform/slice/concat_ws HOF pipeline, which is
    * CodegenFallback — interpreted per shingle per row. Identical output
    * (differential-spec'd: VecExpressionsSpec). */
  private def docShinglesExploded(docs: DataFrame, n: Int): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs
      .select(col("doc_id"),
        explode(call_function("text_shingles", col("text"), lit(n))).as("shingle"))
  }

  /** Distinct (doc_id, shingle-string) pairs — raw strings so exact Jaccard
    * is engine-neutral (the hashed form is minhash's domain). */
  def docShinglesRaw(docs: DataFrame, n: Int): DataFrame =
    docShinglesExploded(docs, n).distinct()

  /** Exact word-n-gram Jaccard pairs ≥ threshold via an inverted index on
    * shingle strings (the quadratic-exact sibling of minhashLshPairs);
    * shingles above the df cut (shared boilerplate) are dropped first. */
  def ngramJaccardPairs(docs: DataFrame, n: Int, threshold: Double,
                        maxDfFraction: Double = 0.5,
                        onDropped: Long => Unit = _ => ()): DataFrame = {
    val sh0 = persistSpillable(docShinglesRaw(docs, n)) // corpus-scale shingles must spill, not OOM
    val sh = dfCut(sh0, docs.count(), "shingle", maxDfFraction, onDropped)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = sh.as("a")
      .join(sh.as("b"), col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Word n-gram shingles, hashed to 64 bits. The distinct runs on the
    * HASHED form: (doc_id, long) shuffles a fraction of the raw-string
    * bytes, and every consumer (minhash signatures, LSH verify) already
    * treats hash equality as shingle identity — the 64-bit space makes a
    * collision astronomically unlikely and the operator's contract is
    * hash-set Jaccard either way. */
  def docShingles(docs: DataFrame, n: Int): DataFrame =
    docShinglesExploded(docs, n)
      .select(col("doc_id"), xxhash64(col("shingle")).as("sh"))
      .distinct()

  /** MinHash signature matrix: the i-th "permutation" is xxhash64(sh, seed+i)
    * — re-hashing beats affine (a*x+b) permutations here: better mixing, and
    * no 64-bit multiply to trip ANSI overflow checking. One aggregation,
    * numHashes min-columns wide (codegen'd). */
  def minhashSignatures(shingles: DataFrame, numHashes: Int, seed: Long): DataFrame = {
    val mins = (0 until numHashes).map { i =>
      min(xxhash64(col("sh"), lit(seed + i))).as(s"mh_$i")
    }
    shingles.groupBy("doc_id").agg(mins.head, mins.tail: _*)
  }

  /** MinHash + banded LSH candidate pairs, verified against exact shingle
    * Jaccard ≥ threshold. bands × rowsPerBand must equal numHashes. */
  def minhashLshPairs(
      docs: DataFrame,
      threshold: Double,
      shingleN: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      seed: Long = 42L
  ): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val shingles = persistSpillable(docShingles(docs, shingleN)) // reused: signatures + verify; spill-tolerant at corpus scale
    val sig = minhashSignatures(shingles, numHashes, seed)

    // band buckets: hash of each band's minhash slice
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64((b * rows until (b + 1) * rows).map(i => col(s"mh_$i")): _*).as("bucket"))
    }
    val buckets = sig
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))

    // bucket-local pair generation (self-join within band+bucket)
    val cand = buckets.as("x")
      .join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()

    // exact verification on candidates only (the LSH contract)
    val sizes = shingles.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = cand
      .join(shingles.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(shingles.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .filter(col("sh_a") === col("sh_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 64-bit SimHash per doc over token hashes weighted by frequency.
    *
    * A document's simhash is a pure function of its own tokens, so it is
    * computed ROW-LOCAL by the codegen'd TextSimhash kernel (one byte scan
    * per doc) — the former explode → 64-conditional-sum aggregation paid a
    * hash-aggregate probe per TOKEN occurrence plus a shuffle, to compute a
    * per-row value. Bit-identical fingerprints (differential-spec'd:
    * VecExpressionsSpec); docs with no non-empty token emit no row, same as
    * the aggregation form. Assumes unique doc_id per row (true of every
    * corpus table; the aggregation form merged duplicate ids instead). */
  def simhash(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs
      .select(col("doc_id"), call_function("text_simhash", col("text")).as("simhash"))
      .filter(col("simhash").isNotNull)
  }

  /** SimHash near-dup pairs with hamming distance ≤ maxDist, found via
    * 16-bit chunk banding (pigeonhole: ≤3 differing bits ⇒ ≥1 of 4 chunks
    * equal), then exact popcount verify. */
  def simhashPairs(docs: DataFrame, maxDist: Int = 3): DataFrame = {
    val sh = simhash(docs)
    val chunks = sh.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("c"), shiftright(col("simhash"), c * 16).bitwiseAND(0xffffL).as("v"))): _*)).as("ch"))
      .select(col("doc_id"), col("simhash"), col("ch.c").as("c"), col("ch.v").as("v"))
    chunks.as("x")
      .join(chunks.as("y"),
        col("x.c") === col("y.c") && col("x.v") === col("y.v") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        col("x.simhash").as("ha"), col("y.simhash").as("hb"))
      .distinct()
      .withColumn("dist", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("dist") <= maxDist)
      .select("id_a", "id_b", "dist")
  }

  /** Benchmark DECONTAMINATION: training documents sharing at least
    * `minHits` distinct word n-grams with a benchmark/eval set — the
    * standard "did the test set leak into the training data" sweep an
    * LLM pipeline runs before training. Returns (doc_id,
    * contaminated_ngrams) for every flagged doc; anti-join the result to
    * clean the corpus.
    *
    * Scale shape: the benchmark side is tiny by construction (eval sets
    * are thousands of docs, the corpus is billions), so its distinct
    * shingle set BROADCASTS — the corpus is touched by exactly one
    * map-side hash semi-join plus a per-doc partial aggregation, no
    * corpus self-join, no shuffle of corpus shingles. */
  def decontaminate(
      docs: DataFrame,
      benchmark: DataFrame,
      n: Int = 3,
      minHits: Int = 1): DataFrame = {
    val benchSh = docShinglesRaw(benchmark, n).select("shingle").distinct()
    // broadcast semi-join BEFORE the per-doc distinct: the corpus-wide
    // (doc_id, shingle) distinct would shuffle every shingle of every doc;
    // filtering against the broadcast bench set first is map-side, so only
    // contaminated shingles (a sliver of the corpus) ever reach a shuffle.
    // count(DISTINCT shingle) restores the exact distinct-hit semantics.
    docShinglesExploded(docs, n)
      .join(broadcast(benchSh), Seq("shingle"))
      .groupBy("doc_id")
      .agg(countDistinct(col("shingle")).as("contaminated_ngrams"))
      .filter(col("contaminated_ngrams") >= minHits)
  }

  /** Near-duplicate CLUSTERS from a similarity-pair table: connected
    * components over the pair graph, labelling every paired doc with the
    * minimum doc id of its component — the production step AFTER pair
    * generation (exact/Jaccard/MinHash/SimHash all emit pairs): keep
    * `doc_id == cluster_id`, drop the rest.
    *
    * Iterative min-label propagation as a DataFrame loop (the LinkRank
    * shape: persisted edges, localCheckpoint lineage cuts, convergence by
    * changed-row count): label(n) ← min(label(n), min over neighbours'
    * labels) until a fixed point. Iterations needed = graph diameter —
    * tiny for near-dup graphs (components are quasi-cliques out of LSH
    * buckets, diameter ≈ 2-4), so the loop is a handful of
    * self-partitioned joins, never an all-pairs pass. Docs with no pair
    * never enter (they are their own canonical row by definition).
    * Throws if maxIter is hit before convergence (no silent partial
    * labels; raise maxIter for pathological chain graphs). */
  def connectedComponents(
      pairs: DataFrame,
      aCol: String = "id_a",
      bCol: String = "id_b",
      maxIter: Int = 25): DataFrame = {
    val edges = persistSpillable(pairs
      .select(col(aCol).cast("long").as("n"), col(bCol).cast("long").as("m"))
      .union(pairs.select(col(bCol).cast("long").as("n"), col(aCol).cast("long").as("m")))
      .distinct())
    var labels = edges.groupBy(col("n"))
      .agg(least(min(col("m")), first(col("n"))).as("lbl"))
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // each node pulls the smallest label among its neighbours, min'd with
      // its own label in ONE aggregation (own label rides the union with a
      // non-null marker column) — one join + one shuffle per iteration where
      // the pull-then-rejoin form paid a second labels join
      val cand = edges
        .join(labels.withColumnRenamed("n", "m"), Seq("m"))
        .select(col("n"), col("lbl"), lit(null).cast("long").as("own"))
        .unionByName(labels.select(col("n"), col("lbl"), col("lbl").as("own")))
      val next = cand.groupBy(col("n"))
        .agg(min(col("lbl")).as("lbl"), min(col("own")).as("prev"))
        .select(col("n"), col("lbl"), (col("lbl") < col("prev")).as("changed"))
        .localCheckpoint(true) // cut lineage, keep data distributed
      converged = next.filter(col("changed")).isEmpty
      labels = next.select(col("n"), col("lbl"))
      iter += 1
    }
    edges.unpersist()
    require(converged, s"connectedComponents did not converge in $maxIter iterations")
    labels.select(col("n").as("doc_id"), col("lbl").as("cluster_id"))
  }
}
