package graft.score

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** scoring-similarity plugin (reference src/plugin/scoring-similarity/
  * cosine/{Model,CosineSimilarity}.java): focused crawling by cosine
  * similarity between each parsed page and a gold-standard document.
  *
  * The reference builds one term-frequency DocVector from the gold-standard
  * text (stopword-filtered, optionally [mingram..maxgram] shingles —
  * Model.java:106-133), scores every parsed page's text against it
  * (CosineSimilarity.setURLScoreAfterParsing:47-71), and each outlink target
  * inherits the full page score (distributeScoreToOutlinks:74-81) so the
  * generator prioritizes pages similar to the gold standard.
  *
  * Spark realization: the gold vector is driver-tiny, so it ships as a
  * literal map INSIDE whole-stage codegen (`typedLit` + `element_at`) — the
  * corpus side never shuffles against it. Per-page scoring is exact integer
  * arithmetic (long dot / long norm²) until the final double division, so
  * the scalar and relational paths agree bit-for-bit and the DuckDB oracle
  * can mirror the formula.
  */
object SimilarityScoring {

  /** The classic Lucene English stop set (public domain list) — the
    * reference's default analyzer drops these before vectorizing. */
  val LuceneStopwords: Set[String] = Set(
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such", "that",
    "the", "their", "then", "there", "these", "they", "this", "to", "was",
    "will", "with")

  /** Gold-standard document vector: exact term counts + L2 norm. */
  case class GoldModel(
      terms: Map[String, Long],
      norm: Double,
      minGram: Int,
      maxGram: Int,
      stopwords: Set[String])

  /** Lowercase, split on non-alphanumerics, drop stopwords; with
    * maxGram > 1, emit [minGram..maxGram]-shingles joined by '_' (the
    * reference's ShingleFilter configuration, Model.java:106-118 — when
    * grams are configured, unigrams appear only if minGram == 1). */
  def tokenize(
      text: String,
      stopwords: Set[String] = LuceneStopwords,
      minGram: Int = 1,
      maxGram: Int = 1): Seq[String] = {
    val base = Option(text).getOrElse("").toLowerCase
      .split("[^a-z0-9]+").iterator.filter(t => t.nonEmpty && !stopwords(t)).toSeq
    if (maxGram <= 1) base
    else (math.max(1, minGram) to maxGram).flatMap { n =>
      if (n == 1) base
      else base.sliding(n).filter(_.size == n).map(_.mkString("_"))
    }
  }

  def goldModel(
      text: String,
      stopwords: Set[String] = LuceneStopwords,
      minGram: Int = 1,
      maxGram: Int = 1): GoldModel = {
    val tf = tokenize(text, stopwords, minGram, maxGram)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    GoldModel(tf, math.sqrt(tf.valuesIterator.map(v => v * v).sum.toDouble),
      minGram, maxGram, stopwords)
  }

  /** Scalar cosine — the per-page scoring used inside the fetch/parse
    * executor path. Integer dot and norm² keep it order-independent. */
  def cosine(text: String, gold: GoldModel): Double = {
    val tf = tokenize(text, gold.stopwords, gold.minGram, gold.maxGram)
      .groupBy(identity).view.mapValues(_.size.toLong)
    var dot = 0L
    var nsq = 0L
    tf.foreach { case (t, c) =>
      dot += c * gold.terms.getOrElse(t, 0L)
      nsq += c * c
    }
    if (nsq == 0L || gold.norm == 0.0) 0.0
    else dot.toDouble / (math.sqrt(nsq.toDouble) * gold.norm)
  }

  /** Relational scorer over a document table (unigram models): explode →
    * per-doc TF → literal-map dot product — two partial-aggregated shuffles,
    * zero joins, gold vector inside codegen. Emits floor(cosine × 10⁶) for
    * engine-neutral comparison (`score_ppm`). Docs whose text yields no
    * tokens are dropped (no vector ⇒ no score, like the reference's
    * "could not create DocVector" branch). */
  def scoreDocs(docs: DataFrame, idCol: String, textCol: String, gold: GoldModel): DataFrame = {
    require(gold.maxGram <= 1, "relational scorer is unigram; use cosine() for shingle models")
    val stop = typedLit(gold.stopwords.toSeq)
    val gmap = typedLit(gold.terms)
    val toks = docs.select(col(idCol),
      explode(filter(split(lower(col(textCol)), "[^a-z0-9]+"),
        t => length(t) > 0 && !array_contains(stop, t))).as("tok"))
    toks.groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("cnt"))
      .groupBy(col(idCol))
      .agg(
        sum(col("cnt") * coalesce(element_at(gmap, col("tok")), lit(0L))).as("dot"),
        sum(col("cnt") * col("cnt")).as("nsq"))
      .select(col(idCol),
        floor(col("dot").cast("double") / (sqrt(col("nsq").cast("double")) * lit(gold.norm)) *
          lit(1000000L)).cast("long").as("score_ppm"))
  }

  /** Re-score fetched pages: successfully parsed pages get score =
    * cosine(concatenated text spans, gold) — the engine's equivalent of
    * passScoreAfterParsing stamping Nutch.SCORE_KEY. Other statuses keep
    * their frontier score. */
  def rescorePages(
      pages: org.apache.spark.sql.Dataset[graft.fetch.FetchedPage],
      gold: GoldModel): org.apache.spark.sql.Dataset[graft.fetch.FetchedPage] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.map { p =>
      if (p.status != graft.schema.CrawlStatus.FETCH_SUCCESS) p
      else {
        val text = p.spans.iterator
          .filter(s => s.kind == "text" && s.text != null).map(_.text).mkString(" ")
        p.copy(score = cosine(text, gold).toFloat)
      }
    }
  }
}
