package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines over the `documents`
  * table (doc_id, text, lang, source, n_chars).
  *
  * Every formula here is deliberately expressible in ANSI SQL with identical
  * arithmetic (the DuckDB oracle mirrors it term-for-term): token counts via
  * split, ratios via replace-counting, language ID via marker-word scoring.
  * All of it is plain `functions._` — whole-stage codegen, no UDFs.
  */
object TextOps {

  /** Occurrences of ` needle ` in the space-padded text (replace-count trick:
    * identical semantics in Spark and DuckDB, no regex dialect risk). */
  def occurrences(padded: Column, needle: String): Column =
    (length(padded) - length(regexp_replace(padded, java.util.regex.Pattern.quote(needle), ""))) / needle.length

  private def occPlain(padded: Column, needle: String): Column =
    (length(padded) - length(replaceLit(padded, needle))) / needle.length

  private def replaceLit(c: Column, s: String): Column =
    call_function("replace", c, lit(s), lit(""))

  /** Token counting: whitespace tokens of the trimmed text. */
  def tokenCount(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(split(trim(col("text")), " ")).as("n_tokens"),
      length(col("text")).as("n_chars_actual")
    )

  /** Quality scoring: length, word stats, stopword ratio, composite score. */
  def quality(docs: DataFrame): DataFrame = {
    val padded = concat(lit(" "), col("text"), lit(" "))
    val words = size(split(trim(col("text")), " ")).cast("double")
    val stops = (occPlain(padded, " the ") + occPlain(padded, " a ") + occPlain(padded, " and ")).cast("double")
    docs.select(
      col("doc_id"),
      length(col("text")).as("chars"),
      words.cast("long").as("words"),
      round(length(replaceLit(col("text"), " ")).cast("double") / words, 4).as("avg_word_len"),
      round(stops / words, 4).as("stop_ratio"),
      round(least(words / lit(50.0), lit(1.0)) * (lit(1.0) - stops / words), 4).as("quality_score")
    )
  }

  /** The marker-word argmax as a reusable column (language-identifier's
    * detection stage re-expressed; also the q_lang_guess oracle formula). */
  def langGuessCol(text: Column): Column = {
    val padded = concat(lit(" "), text, lit(" "))
    def score(markers: Seq[String]): Column =
      markers.map(m => occPlain(padded, s" $m ")).reduce(_ + _)
    val en = score(Seq("the", "and", "of"))
    val es = score(Seq("el", "la", "que"))
    val de = score(Seq("der", "und", "die"))
    val fr = score(Seq("le", "et", "les"))
    when(en >= es && en >= de && en >= fr && en > 0, "en")
      .when(es >= de && es >= fr && es > 0, "es")
      .when(de >= fr && de > 0, "de")
      .when(fr > 0, "fr")
      .otherwise("und")
  }

  /** Language-ID heuristic: marker-word scores, argmax with fixed priority.
    * (A real n-gram model would not be oracle-mirrorable; the marker-count
    * heuristic is the deterministic stand-in with identical SQL.) */
  def langGuess(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("lang").as("lang_labeled"),
      langGuessCol(col("text")).as("lang_guess")
    )

  /** BPE-ish token counting: alpha runs, digit runs, and single punctuation
    * marks each count as one token (the regex shape a byte-pair pre-tokenizer
    * uses). Pure column code: regexp_count over codegen'd expressions. */
  def bpeishTokenCount(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      (regexp_count(col("text"), lit("[A-Za-z]+")) +
        regexp_count(col("text"), lit("[0-9]+")) +
        regexp_count(col("text"), lit("[^A-Za-z0-9\\s]"))).as("n_bpeish_tokens")
    )

  /** REAL merge-table BPE token count ([[Bpe]]): greedy lowest-rank pair
    * merging per word, via the codegen'd `text_bpe_count` expression —
    * the token-budget number an LLM-pipeline user actually wants (the
    * regex sibling above is the cheap approximation). */
  def bpeTokenCount(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.select(col("doc_id"),
      call_function("text_bpe_count", col("text")).as("n_bpe_tokens"))
  }

  /** Position-weighted character fingerprint: sum(ascii(c_i) * i) over the
    * 1-based character positions — deterministic, oracle-mirrorable.
    * (The production-scale rolling hash is the native text_fingerprint64
    * expression; this variant exists for exact SQL parity.) */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      (aggregate(
        transform(split(col("text"), ""), (c, i) => ascii(c).cast("long") * (i + 1).cast("long")),
        lit(0L),
        (acc, x) => acc + x
      ) % 1000000007L).as("fingerprint")
    )

  /** Repetition signals (the Gopher rep filters): the fraction of a
    * document's words claimed by its most frequent token and by its most
    * frequent word 2-gram — boilerplate/spam pages score high and get
    * culled before training. Shapes: explode → per-(doc, gram) count →
    * per-doc max — two partial-aggregated shuffles keyed by doc, the same
    * plan at any corpus size (no per-row quadratic expression work).
    * Fractions emitted as floor-ppm longs (engine-neutral compare). */
  def repetitionSignals(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      split(trim(col("text")), " ").as("tk"))
      .filter(size(col("tk")) > 0)
    def topFrac(grams: DataFrame, n: Int): DataFrame =
      grams
        .groupBy(col("doc_id"), col("g"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(max(col("c")).as("top"), sum(col("c")).as("total"))
        .select(col("doc_id"),
          floor(col("top").cast("double") * lit(n) / (col("total") + lit(n - 1)) * 1000000)
            .cast("long").as(s"rep_top_${n}gram_ppm"))
    val uni = toks.select(col("doc_id"), explode(col("tk")).as("g"))
      .filter(length(col("g")) > 0)
    val bi = toks.filter(size(col("tk")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("tk")) - 2),
          i => concat_ws(" ", col("tk")(i), col("tk")(i + 1)))).as("g"))
    topFrac(uni, 1).join(topFrac(bi, 2), Seq("doc_id"), "left")
  }
}
