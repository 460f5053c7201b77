package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Differential specs for the codegen kernels that replaced interpreted
  * higher-order-function formulas (optimization round 6): each kernel must
  * reproduce the original column formula BIT-FOR-BIT on adversarial inputs —
  * multi-space runs, leading/trailing spaces, empty and null text, unequal
  * array lengths, multi-byte UTF-8 — because the DuckDB oracles mirror the
  * original formulas exactly. */
class VecExpressionsSpec extends AnyFunSuite with SparkSpecBase {

  private lazy val dir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet")
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")

  private lazy val trickyTexts = {
    import spark.implicits._
    Seq(
      (1L, "plain three word text"),
      (2L, "  leading and trailing  "),
      (3L, "double  space   runs between"),
      (4L, ""),
      (5L, "   "),
      (6L, "one"),
      (7L, "two words"),
      (8L, "unicode café naïve 中文 token mix"),
      (9L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
  }

  test("vec_dot ≡ aggregate(zip_with(...)) fold, bit-for-bit, incl. null/length cases") {
    import spark.implicits._
    val hof = aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    // float × float over the real embeddings table (self-join pairs a slice)
    val e = emb.select(col("vec_id"), col("embedding")).filter(col("vec_id") < 40)
    val pairs = e.as("x").join(e.as("y"), col("x.vec_id") < col("y.vec_id"))
      .select(col("x.embedding").as("a"), col("y.embedding").as("b"))
    val rows = pairs
      .select(call_function("vec_dot", col("a"), col("b")).as("k"), hof.as("h"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)), s"bitwise mismatch: $r")
    }
    // float × double-literal (the cosineToLit shape), plus degenerate arrays
    val lit3 = typedLit(Seq(0.25, -1.5, 3.0))
    val deg = Seq(
      (Seq(1.0f, 2.0f, 3.0f), "equal"),
      (Seq(1.0f, 2.0f), "shorter"),
      (Seq.empty[Float], "empty")
    ).toDF("a", "tag")
    val drows = deg.select(col("tag"),
      call_function("vec_dot", col("a"), lit3).as("k"),
      aggregate(zip_with(col("a"), lit3, (x, y) => x.cast("double") * y),
        lit(0.0), (acc, v) => acc + v).as("h")).collect()
    drows.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"null mismatch: $r")
      if (!r.isNullAt(1)) assert(r.getDouble(1) == r.getDouble(2), s"value mismatch: $r")
    }
    // null array → null
    val nrow = Seq(Tuple1(null.asInstanceOf[Seq[Float]])).toDF("a")
      .select(call_function("vec_dot", col("a"), lit3)).collect()
    assert(nrow.head.isNullAt(0))
  }

  test("text_shingles ≡ transform/slice/concat_ws formula on corpus + tricky texts") {
    // compared POST-EXPLODE — the operator contract (docShinglesExploded
    // always explodes, so a null vs empty array for null text is the same
    // zero rows downstream; pre-explode the HOF form returns an empty array
    // where the kernel returns null)
    def hofShingles(n: Int) = {
      val toks = split(trim(col("text")), " ")
      transform(sequence(lit(0), greatest(size(toks) - n, lit(0))),
        i => concat_ws(" ", slice(toks, i + 1, lit(n))))
    }
    // null text excluded from the equality: the HOF form emits one ""
    // shingle for a NULL document (greatest() skips the null size — an
    // accident that would pollute the "" shingle bucket at scale); the
    // kernel null-propagates → zero rows. No corpus fixture has null text
    // (checked all SFs), so every declared query result is unchanged; the
    // kernel's behavior is pinned separately below.
    for (n <- Seq(2, 3, 5); src0 <- Seq(docs.select("doc_id", "text"), trickyTexts)) {
      val src = src0.filter(col("text").isNotNull)
      def explodedMultiset(c: org.apache.spark.sql.Column): Map[(Long, String), Long] =
        src.select(col("doc_id"), explode(c).as("shingle")).collect()
          .groupBy(r => (r.getLong(0), r.getString(1)))
          .view.mapValues(_.length.toLong).toMap
      val kernel = explodedMultiset(call_function("text_shingles", col("text"), lit(n)))
      val hof = explodedMultiset(hofShingles(n))
      assert(kernel == hof, s"exploded shingle multisets differ at n=$n: " +
        s"missing=${(hof.keySet -- kernel.keySet).take(5)} extra=${(kernel.keySet -- hof.keySet).take(5)}")
      assert(kernel.nonEmpty)
    }
    // pinned: null text → null array → zero exploded rows
    val nullRows = trickyTexts.filter(col("text").isNull)
      .select(col("doc_id"), explode(call_function("text_shingles", col("text"), lit(3))))
      .collect()
    assert(nullRows.isEmpty)
  }

  test("text_simhash ≡ explode + 64-bit-vote aggregation, bit-for-bit") {
    def aggSimhash(d: org.apache.spark.sql.DataFrame) = {
      val toks = d
        .select(col("doc_id"), explode(split(trim(col("text")), " ")).as("token"))
        .filter(length(col("token")) > 0)
        .select(col("doc_id"), xxhash64(col("token")).as("th"))
      val bitSums = (0 until 64).map { b =>
        sum(when(shiftright(col("th"), b).bitwiseAND(1) === 1, lit(1L)).otherwise(lit(-1L))).as(s"s_$b")
      }
      val agg = toks.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      val fp = (0 until 64).map { b =>
        when(col(s"s_$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
      }.reduce((a, c) => a.bitwiseOR(c))
      agg.select(col("doc_id"), fp.as("simhash"))
    }
    for (src <- Seq(docs.select("doc_id", "text"), trickyTexts)) {
      val expected = aggSimhash(src).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = graft.ops.DedupOps.simhash(src).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"simhash maps differ: missing=${(expected.keySet -- got.keySet).take(5)} " +
        s"extra=${(got.keySet -- expected.keySet).take(5)}")
    }
  }

  test("text_count_substr (byte scan) ≡ replace-count formula on corpus + tricky texts") {
    // the formula every marker-word scorer originally used — and the one the
    // DuckDB oracles still mirror
    def replaceCount(c: org.apache.spark.sql.Column, s: String) =
      (length(c) - length(call_function("replace", c, lit(s), lit("")))) / s.length
    val needles = Seq(" ", " the ", " a ", "  ", "é", "中文", "aa")
    for (src <- Seq(docs.select("doc_id", "text"), trickyTexts)) {
      val cols = needles.zipWithIndex.flatMap { case (n, i) =>
        Seq(call_function("text_count_substr", col("text"), lit(n)).cast("double").as(s"k$i"),
          replaceCount(col("text"), n).as(s"h$i"))
      }
      src.select(cols: _*).collect().foreach { r =>
        needles.indices.foreach { i =>
          assert(r.isNullAt(2 * i) == r.isNullAt(2 * i + 1) &&
            (r.isNullAt(2 * i) || r.getDouble(2 * i) == r.getDouble(2 * i + 1)),
            s"needle '${needles(i)}' differs on row $r")
        }
      }
    }
    // non-overlapping semantics pin: "aaaa" contains "aa" twice, not three times
    import spark.implicits._
    val one = Seq(Tuple1("aaaa")).toDF("text")
      .select(call_function("text_count_substr", col("text"), lit("aa"))).head.getLong(0)
    assert(one == 2L)
  }
}
