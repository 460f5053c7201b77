package graft.parse

/** parsefilter-naivebayes (reference src/plugin/parsefilter-naivebayes):
  * a two-class (relevant "1" / irrelevant "0") Naive Bayes text classifier
  * gating outlink discovery — an IRRELEVANT page keeps only the outlinks
  * whose URL contains a focus-wordlist term; a relevant page keeps all.
  * The focused-crawling plugin.
  *
  * Train (Train.java:60-120): lines `label \t text`; text lowercased with
  * everything but letters/spaces stripped; per-class doc counts, word
  * counts and word-frequency maps over the shared vocabulary.
  *
  * Classify (Classify.java:45-66) — mirrored EXACTLY, including the
  * reference's idiosyncratic smoothing (log(freq) + 1 − log(words + V) per
  * seen word, 1 − log(words + V) per unseen word — a +1 offset where
  * Laplace add-one would be log(freq+1)) and the tie-breaking default to
  * relevant. Determinism over orthodoxy: parity with the reference is the
  * contract.
  *
  * The model is trained once on the driver from the (small) training lines
  * and ships to executors inside the classify closure — per-page cost is
  * one tokenize + O(words) map lookups, applied once per PAGE (not per
  * link); the wordlist URL check stays a codegen'd `contains` chain.
  */
object NaiveBayes {

  final case class Model(
      vocabSize: Int,
      numIr: Int, wordsIr: Int, freqIr: Map[String, Int],
      numR: Int, wordsR: Int, freqR: Map[String, Int]) extends Serializable

  /** Train.java's tokenization: strip non-letters (keeping spaces),
    * lowercase, split on single spaces (empty tokens survive the split in
    * the reference and are skipped by updateHashMap — we drop them at
    * counting time identically). */
  def tokenize(line: String): Array[String] =
    line.replaceAll("[^a-zA-Z ]", "").toLowerCase.split(" ")

  /** Train over `label \t text` lines (label "0" = irrelevant, anything
    * else = relevant, matching Train.java's else-branch). */
  def train(lines: Seq[String]): Model = {
    var numIr = 0; var numR = 0
    var wordsIr = 0; var wordsR = 0
    val vocab = collection.mutable.HashSet.empty[String]
    val freqIr = collection.mutable.HashMap.empty[String, Int]
    val freqR = collection.mutable.HashMap.empty[String, Int]
    lines.foreach { line =>
      val tab = line.indexOf('\t')
      if (tab > 0) {
        val target = line.substring(0, tab)
        val tokens = tokenize(line.substring(tab + 1))
        // the reference counts array length INCLUDING empty strings but
        // updateHashMap skips "" — mirror both
        if (target == "0") {
          numIr += 1; wordsIr += tokens.length
          tokens.foreach { t => vocab += t; if (t.nonEmpty) freqIr(t) = freqIr.getOrElse(t, 0) + 1 }
        } else {
          numR += 1; wordsR += tokens.length
          tokens.foreach { t => vocab += t; if (t.nonEmpty) freqR(t) = freqR.getOrElse(t, 0) + 1 }
        }
      }
    }
    Model(vocab.size, numIr, wordsIr, freqIr.toMap, numR, wordsR, freqR.toMap)
  }

  /** Classify.java:45-66 verbatim math. true = relevant ("1"). */
  def classifyRelevant(m: Model, text: String): Boolean = {
    if (text == null) return true
    var probIr = 0.0; var probR = 0.0
    val denomIr = math.log(m.wordsIr.toDouble + m.vocabSize)
    val denomR = math.log(m.wordsR.toDouble + m.vocabSize)
    tokenize(text).foreach { w =>
      probIr += (m.freqIr.get(w) match {
        case Some(f) => math.log(f.toDouble) + 1 - denomIr
        case None => 1 - denomIr
      })
      probR += (m.freqR.get(w) match {
        case Some(f) => math.log(f.toDouble) + 1 - denomR
        case None => 1 - denomR
      })
    }
    probIr += math.log(m.numIr.toDouble) - math.log((m.numIr + m.numR).toDouble)
    probR += math.log(m.numR.toDouble) - math.log((m.numIr + m.numR).toDouble)
    // prob_ir > prob_r → "0"; ties (and NaN from an empty class) → relevant
    !(probIr > probR)
  }
}
