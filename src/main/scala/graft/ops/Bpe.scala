package graft.ops

/** Merge-table-driven byte-pair tokenization for data budgeting.
  *
  * Real BPE encoding, tiktoken-style: a word starts as its character
  * symbols; repeatedly the adjacent pair with the LOWEST merge rank
  * (leftmost on ties) merges, one occurrence per step, until no adjacent
  * pair is in the table. Token count = sum of final symbol counts over
  * whitespace words. This replaces the regex-class approximation
  * (`TextOps.bpeishTokenCount`, kept as the cheap sibling) with the real
  * merge-table algorithm an LLM-pipeline user budgets tokens with.
  *
  * The merge table here is a small checked-in vocabulary (deterministic,
  * shared verbatim with the DuckDB oracle via [[rankCaseSql]]). A
  * production deployment swaps [[Merges]] for a trained table (e.g. a
  * 50k-merge GPT-2 vocab) broadcast to executors — the algorithm and the
  * codegen'd expression are unchanged; only the map grows.
  */
object Bpe {

  /** Checked-in merge rules, rank = position (lower merges first). */
  val Merges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("a", "n"), ("s", "c"), ("sc", "an"),
    ("e", "r"), ("o", "r"), ("h", "a"), ("ha", "s"), ("has", "h"),
    ("r", "o"), ("ro", "w"), ("j", "o"), ("jo", "i"), ("joi", "n"),
    ("d", "a"), ("da", "t"), ("dat", "a"), ("l", "o"), ("s", "lo"),
    ("slo", "w"), ("k", "e"), ("ke", "y"), ("l", "e"), ("or", "t"),
    ("er", "y"), ("t", "a"), ("ta", "b"), ("tab", "le"), ("s", "m"),
    ("sm", "al"), ("a", "l"), ("b", "at"), ("a", "t"), ("i", "n"),
    ("in", "e"), ("u", "e"), ("q", "ue"), ("g", "g"), ("a", "gg"))

  private val Rank: Map[(String, String), Int] =
    Merges.zipWithIndex.toMap

  /** Final symbol count of one word under the merge table. */
  def encodeWordCount(word: String): Int = {
    if (word.isEmpty) return 0
    val syms = new scala.collection.mutable.ArrayBuffer[String](word.length)
    var i = 0
    while (i < word.length) { syms += String.valueOf(word.charAt(i)); i += 1 }
    var done = false
    while (!done) {
      var best = Int.MaxValue
      var pos = -1
      var j = 0
      while (j < syms.length - 1) {
        val r = Rank.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
        if (r < best) { best = r; pos = j } // strict < keeps the LEFTMOST tie
        j += 1
      }
      if (pos < 0) done = true
      else {
        syms(pos) = syms(pos) + syms(pos + 1)
        syms.remove(pos + 1)
      }
    }
    syms.length
  }

  /** Token count of a document: whitespace words, each BPE-encoded.
    * Static forwarder for the codegen'd `text_bpe_count` expression. */
  def countTokens(text: String): Long = {
    if (text == null) return 0L
    var count = 0L
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && Character.isWhitespace(text.charAt(i))) i += 1
      val start = i
      while (i < n && !Character.isWhitespace(text.charAt(i))) i += 1
      if (i > start) count += encodeWordCount(text.substring(start, i))
    }
    count
  }

  /** DuckDB `CASE` expression ranking an adjacent symbol pair (columns a, b)
    * — generated from [[Merges]] so engine and oracle share one table.
    * 999999 = not in the table. */
  def rankCaseSql(a: String, b: String): String = {
    val whens = Merges.zipWithIndex.map { case ((x, y), r) =>
      s"WHEN $a = '$x' AND $b = '$y' THEN $r"
    }
    s"CASE ${whens.mkString(" ")} ELSE 999999 END"
  }

  /** DuckDB mirror of [[countTokens]] over the documents table: words as
    * char lists, one lowest-rank (leftmost-tie) merge per recursion step
    * until no pair is in the table, then symbol counts summed per doc.
    * Shares [[Merges]] with the engine via [[rankCaseSql]]. */
  def oracleSql: String = {
    val rank = rankCaseSql("s[i]", "s[i+1]")
    s"""WITH RECURSIVE
       w0 AS (SELECT doc_id, unnest(str_split(trim(text), ' ')) AS w FROM documents),
       w1 AS (SELECT doc_id, w FROM w0 WHERE length(w) > 0),
       enc AS (
         SELECT doc_id, str_split(w, '') AS s FROM w1
         UNION ALL
         SELECT doc_id,
                list_concat(list_concat(s[1:bp-1], [s[bp] || s[bp+1]]), s[bp+2:]) AS s
         FROM (SELECT doc_id, s,
                      list_position(rk, list_min(rk)) AS bp, list_min(rk) AS mr
               FROM (SELECT doc_id, s,
                            list_transform(range(1, len(s)), i -> $rank) AS rk
                     FROM enc) t) u
         WHERE mr IS NOT NULL AND mr < 999999
       ),
       fin AS (
         SELECT doc_id, s FROM
           (SELECT doc_id, s,
                   list_min(list_transform(range(1, len(s)), i -> $rank)) AS mr
            FROM enc) t
         WHERE mr IS NULL OR mr >= 999999
       )
       SELECT doc_id, CAST(sum(len(s)) AS BIGINT) AS n_bpe_tokens
       FROM fin GROUP BY doc_id"""
  }
}
