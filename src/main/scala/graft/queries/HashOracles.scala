package graft.queries

import scala.collection.mutable.ArrayBuffer

/** DuckDB oracle SQL for the four xxhash64-based driver queries
  * (q_minhash_lsh, q_simhash_pairs, q_ann_lsh_topk, q_ann_ivf_topk).
  *
  * Spark's `xxhash64` (XXH64 with seed 42, multi-arg values chained as
  * running seeds — catalyst XxHash64 / XXH64.java semantics) is re-derived
  * from first principles as DuckDB SQL: unsigned 64-bit arithmetic carried
  * in HUGEINT with `&`/`>>`/`<<` wraparound (bit ops are ~25× cheaper than
  * 128-bit division), one mixing op per CTE stage so every operand is a
  * plain column (keeps the macro-inlined expression trees small and lets
  * DuckDB CSE work). Validated bit-exact against Spark for longs, ints,
  * ASCII strings of every byte length 0..31, and chained multi-arg calls
  * (the corpus tokens/shingles are ASCII and ≤ 26 bytes; the string path
  * unrolls 3 words + 4-byte chunk + 3 tail bytes = 31 bytes max).
  *
  * Oracle strings are multi-statement: a macro prelude then the query
  * (CREATE OR REPLACE keeps them idempotent on a shared connection).
  */
object HashOracles {

  // xxh64 primes (unsigned decimal)
  private val P1 = "11400714785074694791"
  private val P2 = "14029467366897019727"
  private val P3 = "1609587929392839161"
  private val P4 = "9650029242287828579"
  private val P5 = "2870177450012600261"
  private val P5_8 = "2870177450012600269" // P5 + 8 (long-input length add)
  private val P5_4 = "2870177450012600265" // P5 + 4 (int-input length add)
  private val M64 = "18446744073709551615" // 2^64 - 1

  val Prelude: String = """
CREATE OR REPLACE MACRO xx_u64(x) AS CAST(x AS HUGEINT) & 18446744073709551615;
CREATE OR REPLACE MACRO xx_s64(u) AS CAST(CASE WHEN u >= 9223372036854775808 THEN u - 18446744073709551616 ELSE u END AS BIGINT);
CREATE OR REPLACE MACRO xx_mul(a, b) AS ((CAST(a AS HUGEINT) & 4294967295) * (CAST(b AS HUGEINT) & 4294967295) + ((((CAST(a AS HUGEINT) >> 32) * (CAST(b AS HUGEINT) & 4294967295) + (CAST(a AS HUGEINT) & 4294967295) * (CAST(b AS HUGEINT) >> 32)) & 4294967295) << 32)) & 18446744073709551615;
CREATE OR REPLACE MACRO xx_rotl(u, r) AS ((CAST(u AS HUGEINT) & ((CAST(1 AS HUGEINT) << (64 - r)) - 1)) << r) | (CAST(u AS HUGEINT) >> (64 - r));
CREATE OR REPLACE MACRO xx_k1(v) AS xx_mul(xx_rotl(xx_mul(v, 14029467366897019727), 31), 11400714785074694791);
CREATE OR REPLACE MACRO xx_w8(s, j) AS CAST(unicode(s[8*j+1]) AS HUGEINT) + unicode(s[8*j+2])*256 + unicode(s[8*j+3])*65536 + unicode(s[8*j+4])*16777216 + unicode(s[8*j+5])*CAST(4294967296 AS HUGEINT) + unicode(s[8*j+6])*CAST(1099511627776 AS HUGEINT) + unicode(s[8*j+7])*CAST(281474976710656 AS HUGEINT) + unicode(s[8*j+8])*CAST(72057594037927936 AS HUGEINT);
CREATE OR REPLACE MACRO xx_w4(s, o) AS CAST(unicode(s[o+1]) AS HUGEINT) + unicode(s[o+2])*256 + unicode(s[o+3])*65536 + unicode(s[o+4])*16777216;
"""

  /** Accumulates single-op CTE stages; every op's output is a column. */
  private final class Stages(pre: String, tag: String) {
    val stages = new ArrayBuffer[(String, String)]
    private var n = 0

    def step(expr: String): String = {
      val name = s"$tag$n"
      val out = s"${tag}c$n"
      val src = if (n == 0) pre else s"$tag${n - 1}"
      stages += ((name, s"SELECT *, $expr AS $out FROM $src"))
      n += 1
      out
    }

    def renameLast(out: String): String = {
      val (name, q) = stages.last
      stages(stages.length - 1) = (name, q.replace(s" AS ${tag}c${n - 1} ", s" AS $out "))
      out
    }

    def lastTable: String = s"$tag${n - 1}"
  }

  /** h = (a * const) mod 2^64 via 32-bit split (products stay < 2^127). */
  private def mulStep(b: Stages, a: String, const: BigInt): String = {
    val bl = const & 0xffffffffL
    val bh = const >> 32
    b.step(s"(($a & 4294967295) * $bl + (((($a >> 32) * $bl + ($a & 4294967295) * $bh) & 4294967295) << 32)) & $M64")
  }

  private def rotlStep(b: Stages, a: String, r: Int): String = {
    val mask = (BigInt(1) << (64 - r)) - 1
    b.step(s"(($a & $mask) << $r) | ($a >> ${64 - r})")
  }

  private def fmixSteps(b: Stages, h: String): String = {
    var x = b.step(s"xor($h, $h >> 33)")
    x = mulStep(b, x, BigInt(P2))
    x = b.step(s"xor($x, $x >> 29)")
    x = mulStep(b, x, BigInt(P3))
    b.step(s"xor($x, $x >> 32)")
  }

  private def mix27Steps(b: Stages, h: String, k: String): String = {
    var x = b.step(s"xor($h, $k)")
    x = rotlStep(b, x, 27)
    x = mulStep(b, x, BigInt(P1))
    b.step(s"($x + $P4) & $M64")
  }

  private def mix23Steps(b: Stages, h: String, w: String): String = {
    val kw = mulStep(b, w, BigInt(P1))
    var x = b.step(s"xor($h, $kw)")
    x = rotlStep(b, x, 23)
    x = mulStep(b, x, BigInt(P2))
    b.step(s"($x + $P3) & $M64")
  }

  private def k1Steps(b: Stages, v: String): String = {
    var x = mulStep(b, v, BigInt(P2))
    x = rotlStep(b, x, 31)
    mulStep(b, x, BigInt(P1))
  }

  /** out = xxh64 of a 64-bit value expr with seed expr (unsigned domain). */
  private def hashLong(b: Stages, vExpr: String, seedExpr: String, out: String): String = {
    val v = b.step(vExpr)
    val h0 = b.step(s"(CAST($seedExpr AS HUGEINT) + $P5_8) & $M64")
    val k = k1Steps(b, v)
    val h1 = mix27Steps(b, h0, k)
    fmixSteps(b, h1)
    b.renameLast(out)
  }

  /** hashLong with k1(v) precomputed in column kCol (constant v side). */
  private def hashLongK(b: Stages, kCol: String, seedExpr: String, out: String): String = {
    val h0 = b.step(s"(CAST($seedExpr AS HUGEINT) + $P5_8) & $M64")
    val h1 = mix27Steps(b, h0, kCol)
    fmixSteps(b, h1)
    b.renameLast(out)
  }

  /** out = xxh64 of a 32-bit value expr (Spark hashes IntegerType as 4 bytes). */
  private def hashInt(b: Stages, vExpr: String, seedExpr: String, out: String): String = {
    val v = b.step(s"CAST($vExpr AS HUGEINT) & 4294967295")
    val h0 = b.step(s"(CAST($seedExpr AS HUGEINT) + $P5_4) & $M64")
    val h1 = mix23Steps(b, h0, v)
    fmixSteps(b, h1)
    b.renameLast(out)
  }

  /** out = xxh64 of an ASCII string column, byte length <= 31, seed 42:
    * 3 conditional 8-byte words, optional 4-byte chunk, 3 tail bytes. */
  private def hashStr(b: Stages, sCol: String, seed: Long, out: String): String = {
    val n = b.step(s"length($sCol)")
    val lenAdd = (BigInt(P5) + seed) % (BigInt(M64) + 1)
    var h = b.step(s"(CAST($n AS HUGEINT) + $lenAdd) & $M64")
    for (j <- 0 until 3) {
      val w = b.step(s"CASE WHEN $n >= ${8 * (j + 1)} THEN xx_w8($sCol, $j) ELSE 0 END")
      val k = k1Steps(b, w)
      val hn = mix27Steps(b, h, k)
      h = b.step(s"CASE WHEN $n >= ${8 * (j + 1)} THEN $hn ELSE $h END")
    }
    val ob = b.step(s"($n // 8) * 8 + CASE WHEN $n % 8 >= 4 THEN 4 ELSE 0 END")
    val w4 = b.step(s"CASE WHEN $n % 8 >= 4 THEN xx_w4($sCol, ($n // 8) * 8) ELSE 0 END")
    val h4 = mix23Steps(b, h, w4)
    h = b.step(s"CASE WHEN $n % 8 >= 4 THEN $h4 ELSE $h END")
    for (j <- 0 until 3) {
      val bb = b.step(s"CASE WHEN $n - $ob >= ${j + 1} THEN CAST(unicode($sCol[$ob + ${j + 1}]) AS HUGEINT) ELSE 0 END")
      val kb = mulStep(b, bb, BigInt(P5))
      var x = b.step(s"xor($h, $kb)")
      x = rotlStep(b, x, 11)
      val hn = mulStep(b, x, BigInt(P1))
      h = b.step(s"CASE WHEN $n - $ob >= ${j + 1} THEN $hn ELSE $h END")
    }
    fmixSteps(b, h)
    b.renameLast(out)
  }

  private def withSql(stages: Seq[(String, String)], finalSelect: String,
                      materialized: Set[String]): String = {
    val parts = stages.map { case (n, q) =>
      if (materialized(n)) s"$n AS MATERIALIZED ($q)" else s"$n AS ($q)"
    }
    Prelude + "WITH " + parts.mkString(",\n") + "\n" + finalSelect
  }

  /** Mirror of DedupOps.minhashLshPairs(docsAug, 0.5, 3, 64, 16, 42):
    * distinct shingle hash → 64 minhash mins → 16 band buckets (4-long
    * xxhash64 chains) → bucket-local candidates → exact Jaccard verify. */
  def minhashLshSql: String = {
    val s = new ArrayBuffer[(String, String)]
    s += (("aug",
      """SELECT doc_id, text FROM documents
         UNION ALL SELECT doc_id + 10000, text FROM documents WHERE doc_id < 20"""))
    s += (("toks", "SELECT doc_id, str_split(trim(text), ' ') AS tk FROM aug"))
    s += (("sh0",
      """SELECT DISTINCT doc_id,
           unnest(list_transform(range(1, greatest(len(tk) - 2, 1) + 1),
                  i -> array_to_string(tk[i:i+2], ' '))) AS shingle FROM toks"""))
    s += (("dsh", "SELECT DISTINCT shingle FROM sh0"))
    val bs = new Stages("dsh", "hs")
    hashStr(bs, "shingle", 42L, "shu")
    s ++= bs.stages
    s += (("shh", s"SELECT shingle, shu FROM ${bs.lastTable}"))
    s += (("docsh", "SELECT d.doc_id, h.shu FROM sh0 d JOIN shh h USING (shingle)"))
    val bi = new Stages("shh", "hi")
    hashLong(bi, "shu", "42", "h1")
    s ++= bi.stages
    s += (("hiv", s"SELECT shu, h1 FROM ${bi.lastTable}"))
    s += (("seeds", "SELECT i, xx_k1(xx_u64(42 + i)) AS sk FROM range(64) t(i)"))
    s += (("mh0", "SELECT shu, h1, i, sk FROM hiv CROSS JOIN seeds"))
    val bm = new Stages("mh0", "mm")
    hashLongK(bm, "sk", "h1", "mv")
    s ++= bm.stages
    s += (("mhv", s"SELECT shu, i, xx_s64(mv) AS m FROM ${bm.lastTable}"))
    s += (("mh",
      """SELECT d.doc_id, v.i, min(v.m) AS m
         FROM docsh d JOIN mhv v USING (shu) GROUP BY 1, 2"""))
    s += (("bp",
      """SELECT doc_id, i // 4 AS band,
           max(CASE WHEN i % 4 = 0 THEN m END) AS m0,
           max(CASE WHEN i % 4 = 1 THEN m END) AS m1,
           max(CASE WHEN i % 4 = 2 THEN m END) AS m2,
           max(CASE WHEN i % 4 = 3 THEN m END) AS m3 FROM mh GROUP BY 1, 2"""))
    val bb = new Stages("bp", "bb")
    var h = hashLong(bb, "xx_u64(m0)", "42", "bh1")
    h = hashLong(bb, "xx_u64(m1)", h, "bh2")
    h = hashLong(bb, "xx_u64(m2)", h, "bh3")
    h = hashLong(bb, "xx_u64(m3)", h, "bh4")
    s ++= bb.stages
    s += (("buckets", s"SELECT doc_id, band, xx_s64(bh4) AS bucket FROM ${bb.lastTable}"))
    s += (("cand",
      """SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
         FROM buckets x JOIN buckets y
           ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id"""))
    s += (("sizes", "SELECT doc_id, count(*) AS sz FROM docsh GROUP BY 1"))
    s += (("inter",
      """SELECT c.id_a, c.id_b, count(*) AS i
         FROM cand c
         JOIN docsh a ON a.doc_id = c.id_a
         JOIN docsh b ON b.doc_id = c.id_b AND b.shu = a.shu
         GROUP BY 1, 2"""))
    val fin =
      """SELECT id_a, id_b,
           round(CAST(i.i AS DOUBLE) / (sa.sz + sb.sz - i.i), 4) AS jaccard
         FROM inter i JOIN sizes sa ON sa.doc_id = i.id_a JOIN sizes sb ON sb.doc_id = i.id_b
         WHERE round(CAST(i.i AS DOUBLE) / (sa.sz + sb.sz - i.i), 4) >= 0.5"""
    withSql(s.toSeq, fin, Set("sh0", "shh", "docsh", "mh", "buckets", "cand", "sizes"))
  }

  /** Mirror of SampleOps.stratifiedSample(documents, "doc_id", "lang",
    * rates, default, seed): one long-hash chain per row with the seed
    * literal pre-folded driver-side (`seedU64` = unsigned
    * SampleOps.xxh64Long(seed, 42)), then the pmod bucket and the
    * per-stratum ppm threshold. */
  def stratifiedSampleSql(seedU64: BigInt, ppm: Map[String, Long], defaultPpm: Long): String = {
    val s = new ArrayBuffer[(String, String)]
    s += (("base", "SELECT doc_id, lang FROM documents"))
    val b = new Stages("base", "ss")
    hashLong(b, "xx_u64(doc_id)", seedU64.toString, "hh")
    s ++= b.stages
    s += (("bkt",
      s"SELECT doc_id, lang, ((xx_s64(hh) % 1000000) + 1000000) % 1000000 AS sample_bucket FROM ${b.lastTable}"))
    val cases = ppm.toSeq.sortBy(_._1).map { case (k, v) => s"WHEN lang = '$k' THEN $v" }.mkString(" ")
    val fin =
      s"SELECT doc_id, lang, sample_bucket FROM bkt WHERE sample_bucket < CASE $cases ELSE $defaultPpm END"
    withSql(s.toSeq, fin, Set.empty)
  }

  /** Mirror of DedupOps.simhashPairs(docsAug, 3): token-hash weighted bit
    * votes → 64-bit fingerprint → 16-bit chunk banding → popcount verify. */
  def simhashPairsSql: String = {
    val s = new ArrayBuffer[(String, String)]
    s += (("aug",
      """SELECT doc_id, text FROM documents
         UNION ALL SELECT doc_id + 10000, text FROM documents WHERE doc_id < 20"""))
    s += (("tok0", "SELECT doc_id, unnest(str_split(trim(text), ' ')) AS token FROM aug"))
    s += (("tok1", "SELECT doc_id, token, count(*) AS cnt FROM tok0 WHERE length(token) > 0 GROUP BY 1, 2"))
    s += (("dtok", "SELECT DISTINCT token FROM tok1"))
    val bt = new Stages("dtok", "ht")
    hashStr(bt, "token", 42L, "thu")
    s ++= bt.stages
    s += (("tokh", s"SELECT token, thu FROM ${bt.lastTable}"))
    s += (("tw", "SELECT doc_id, thu, sum(cnt) AS w FROM tok1 JOIN tokh USING (token) GROUP BY 1, 2"))
    val bits = (0 until 64)
      .map(bb => s"sum(CASE WHEN (thu >> $bb) & 1 = 1 THEN w ELSE -w END) AS s_$bb")
      .mkString(", ")
    s += (("votes", s"SELECT doc_id, $bits FROM tw GROUP BY doc_id"))
    val fp = (0 until 64)
      .map(bb => s"CASE WHEN s_$bb > 0 THEN CAST(${BigInt(1) << bb} AS HUGEINT) ELSE 0 END")
      .mkString(" + ")
    s += (("fp", s"SELECT doc_id, $fp AS fpu FROM votes"))
    s += (("sh", "SELECT doc_id, fpu, xx_s64(fpu) AS simhash FROM fp"))
    s += (("chunks",
      """SELECT doc_id, simhash, c, CAST((fpu >> (c * 16)) & 65535 AS BIGINT) AS v
         FROM sh CROSS JOIN range(4) t(c)"""))
    s += (("pairs",
      """SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
           x.simhash AS ha, y.simhash AS hb
         FROM chunks x JOIN chunks y
           ON x.c = y.c AND x.v = y.v AND x.doc_id < y.doc_id"""))
    val fin =
      """SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS INTEGER) AS dist
         FROM pairs WHERE bit_count(xor(ha, hb)) <= 3"""
    withSql(s.toSeq, fin, Set("tok1", "tokh", "sh", "chunks", "pairs"))
  }

  private def cosSql(e: String, c: String): String =
    s"""list_sum(list_transform(list_zip($e, $c),
           x -> CAST(x[1] AS DOUBLE) * x[2]))
         / (sqrt(list_sum(list_transform($e, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
          * sqrt(list_sum(list_transform($c, v -> v * v))))"""

  /** Mirror of SimilarityOps.lshTopK(emb, 0 until 8, 5, planes=6, seed=42):
    * hash-derived hyperplane weights, sign-projection buckets, hamming-1
    * probes, exact re-rank. Dot products fold left-to-right on both sides. */
  def annLshTopKSql: String = {
    val s = new ArrayBuffer[(String, String)]
    s += (("pd", "SELECT p, d FROM range(6) a(p) CROSS JOIN range(64) b(d)"))
    val bw = new Stages("pd", "hw")
    val h1 = hashLong(bw, "xx_u64(42)", "42", "wh1")
    val h2 = hashInt(bw, "p", h1, "wh2")
    hashInt(bw, "d", h2, "wh3")
    s ++= bw.stages
    s += (("wt",
      s"""SELECT p, d,
            CAST(((xx_s64(wh3) % 2001) + 2001) % 2001 - 1000 AS DOUBLE) / 1000.0 AS w
          FROM ${bw.lastTable}"""))
    s += (("wl", "SELECT p, list(w ORDER BY d) AS wl FROM wt GROUP BY p"))
    s += (("proj",
      """SELECT e.vec_id, w.p,
           list_sum(list_transform(list_zip(e.embedding, w.wl),
                    x -> CAST(x[1] AS DOUBLE) * x[2])) AS pr
         FROM embeddings e CROSS JOIN wl w"""))
    val bits = (0 until 6)
      .map(p => s"CASE WHEN p = $p AND pr > 0 THEN ${1L << p} ELSE 0 END")
      .mkString(" + ")
    s += (("bkt", s"SELECT vec_id, CAST(sum($bits) AS BIGINT) AS bucket FROM proj GROUP BY vec_id"))
    s += (("bemb", "SELECT b.vec_id, b.bucket, e.embedding FROM bkt b JOIN embeddings e USING (vec_id)"))
    val probes = ((0 until 6).map(p => s"xor(bucket, ${1L << p})") :+ "bucket").mkString(", ")
    s += (("q",
      s"""SELECT vec_id AS qid, embedding AS qe, unnest([$probes]) AS probe
          FROM bemb WHERE vec_id < 8"""))
    s += (("scored",
      s"""SELECT DISTINCT q.qid, c.vec_id,
            CAST(floor((${cosSql("q.qe", "list_transform(c.embedding, v -> CAST(v AS DOUBLE))")}) * 10000) AS BIGINT) AS cos_bp
          FROM bemb c JOIN q ON c.bucket = q.probe AND c.vec_id <> q.qid"""))
    val fin =
      """SELECT qid, vec_id, cos_bp, rnk FROM
           (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos_bp DESC, vec_id ASC) AS rnk
            FROM scored) t WHERE rnk <= 5"""
    withSql(s.toSeq, fin, Set("wl", "bkt", "bemb", "scored"))
  }

  /** Mirror of SimilarityOps.ivfTopK(emb, 0 until 8, 5): hash-seeded init,
    * 3 Lloyd iterations with 1e-6-quantized means (the quantization that
    * makes the engine's index build order-independent also makes it
    * mirrorable here), final assignment, top-4-cell probe, exact re-rank. */
  def annIvfTopKSql: String = {
    val s = new ArrayBuffer[(String, String)]

    def assign(ctab: String, out: String): Unit = {
      s += ((s"${out}_sc",
        s"""SELECT e.vec_id, e.embedding, c.cid, ${cosSql("e.embedding", "c.clist")} AS cos
            FROM embeddings e CROSS JOIN $ctab c"""))
      s += ((out,
        s"""SELECT vec_id, embedding, cid AS cell FROM
              (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid DESC) AS rn
               FROM ${out}_sc) t WHERE rn = 1"""))
    }

    def lloyd(asg: String, prev: String, out: String): Unit = {
      s += ((s"${out}_m",
        s"""SELECT cell, i AS pos,
              floor(avg(CAST(embedding[i + 1] AS DOUBLE)) * 1000000) / 1000000 AS m
            FROM $asg CROSS JOIN range(64) t(i) GROUP BY 1, 2"""))
      s += ((s"${out}_l", s"SELECT cell AS cid, list(m ORDER BY pos) AS mlist FROM ${out}_m GROUP BY 1"))
      s += ((out,
        s"""SELECT p.cid, coalesce(m.mlist, p.clist) AS clist
            FROM $prev p LEFT JOIN ${out}_l m USING (cid)"""))
    }

    s += (("emb0", "SELECT vec_id, embedding FROM embeddings"))
    val bv = new Stages("emb0", "hv")
    val ih1 = hashLong(bv, "xx_u64(vec_id)", "42", "ih1")
    hashLong(bv, "xx_u64(42)", ih1, "ih2")
    s ++= bv.stages
    s += (("hs", s"SELECT vec_id, xx_s64(ih2) AS h FROM ${bv.lastTable}"))
    s += (("c0",
      """SELECT row_number() OVER (ORDER BY h.h) - 1 AS cid,
           list_transform(e.embedding, v -> CAST(v AS DOUBLE)) AS clist
         FROM hs h JOIN embeddings e USING (vec_id) ORDER BY h.h LIMIT 16"""))
    var prev = "c0"
    for (it <- 0 until 3) {
      assign(prev, s"a$it")
      lloyd(s"a$it", prev, s"c${it + 1}")
      prev = s"c${it + 1}"
    }
    assign(prev, "asg")
    s += (("qsc",
      s"""SELECT q.vec_id AS qid, q.embedding AS qe, c.cid, ${cosSql("q.embedding", "c.clist")} AS cos
          FROM asg q CROSS JOIN $prev c WHERE q.vec_id < 8"""))
    s += (("qp",
      """SELECT qid, qe, cid AS probe FROM
           (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid DESC) AS rn
            FROM qsc) t WHERE rn <= 4"""))
    s += (("scored",
      s"""SELECT DISTINCT q.qid, a.vec_id,
            CAST(floor((${cosSql("q.qe", "list_transform(a.embedding, v -> CAST(v AS DOUBLE))")}) * 10000) AS BIGINT) AS cos_bp
          FROM asg a JOIN qp q ON a.cell = q.probe AND a.vec_id <> q.qid"""))
    val fin =
      """SELECT qid, vec_id, cos_bp, rnk FROM
           (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos_bp DESC, vec_id ASC) AS rnk
            FROM scored) t WHERE rnk <= 5"""
    val mat = Set("hs", "c0", "asg", "qp", "scored") ++
      (0 until 3).flatMap(i => Seq(s"a$i", s"c${i + 1}")).toSet
    withSql(s.toSeq, fin, mat)
  }
}
