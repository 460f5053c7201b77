package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the vector / shingle / simhash hot paths.
  *
  * Spark's higher-order functions (transform / zip_with / aggregate) are
  * CodegenFallback: every array element evaluates through interpreted lambda
  * variables with per-element boxing. A 64-dim dot product inside an
  * all-pairs join, or 3-gram shingling of every document, pays that
  * interpreter tax once per element per row — these kernels run the same
  * arithmetic as one static JVM call per row inside whole-stage codegen.
  *
  * EXACTNESS CONTRACT: each kernel reproduces the HOF formula it replaces
  * bit-for-bit (same IEEE accumulation order, same null semantics, same
  * token/byte boundaries) — asserted by differential specs
  * (VecExpressionsSpec) against the original column formulas.
  */
object VecNative {

  /** Strict left-to-right dot product — the exact twin of
    * `aggregate(zip_with(a, b, (x, y) => x.cast(double) * y.cast(double)),
    *            0.0, (acc, v) => acc + v)`:
    * zip_with pads unequal lengths with nulls and any null product nulls the
    * whole fold, so: null on length mismatch or any null element, else the
    * ascending-index sum of double products (float widens exactly). */
  def dot(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  /** Word n-gram shingles — the exact twin of
    * `transform(sequence(0, greatest(size(toks) - n, 0)),
    *            i => concat_ws(" ", slice(toks, i + 1, n)))`
    * over `toks = split(trim(text), " ")`.
    *
    * Key identity: split on the single-space regex and re-join with a single
    * space reconstructs the original bytes, so shingle i is exactly the byte
    * span of the trimmed text from the start of token i to the end of token
    * min(i+n-1, m-1) — no per-token strings, no HOF lambda evaluation, one
    * byte scan plus m-n+1 zero-copy slices over one copied buffer. */
  def shingles(s: UTF8String, n: Int): ArrayData = {
    val b = s.trim().getBytes // trim = StringTrim: ASCII 0x20 both ends
    val len = b.length
    // token boundaries: starts(i) and ends(i) in byte offsets. A 0x20 byte
    // never occurs inside a multi-byte UTF-8 sequence, so byte scanning is
    // codepoint-safe. split(_, " ", -1) yields (#spaces + 1) tokens, empties
    // included — exactly the runs between space bytes.
    var m = 1
    var i = 0
    while (i < len) { if (b(i) == 0x20) m += 1; i += 1 }
    val starts = new Array[Int](m)
    val ends = new Array[Int](m)
    var t = 0
    var start = 0
    i = 0
    while (i <= len) {
      if (i == len || b(i) == 0x20) {
        starts(t) = start; ends(t) = i; t += 1; start = i + 1
      }
      i += 1
    }
    val count = math.max(m - n, 0) + 1
    val out = new Array[Any](count)
    var k = 0
    while (k < count) {
      val e = ends(math.min(k + n - 1, m - 1))
      out(k) = UTF8String.fromBytes(b, starts(k), e - starts(k))
      k += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash over whitespace tokens — the exact twin of
    *   toks = split(trim(text), " ") filtered non-empty
    *   th = xxhash64(token)                         (catalyst XXH64, seed 42)
    *   s_b = Σ_tokens (bit b of th ? +1 : -1)
    *   fp  = OR of (1 << b) where s_b > 0
    * s_b > 0 ⟺ 2·ones_b > total. Null when no non-empty token exists (the
    * aggregation form emitted no row for such docs). One row per doc_id is
    * the caller's contract (doc ids are unique in every corpus table). */
  def simhash64(s: UTF8String): java.lang.Long = {
    val b = s.trim().getBytes
    val len = b.length
    val ones = new Array[Long](64)
    var total = 0L
    var start = 0
    var i = 0
    while (i <= len) {
      if (i == len || b(i) == 0x20) {
        val tl = i - start
        if (tl > 0) {
          val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
            b, Platform.BYTE_ARRAY_OFFSET + start, tl, 42L)
          total += 1
          var bit = 0
          while (bit < 64) { ones(bit) += (h >>> bit) & 1L; bit += 1 }
        }
        start = i + 1
      }
      i += 1
    }
    if (total == 0L) return null
    var fp = 0L
    var bit = 0
    while (bit < 64) { if (2L * ones(bit) > total) fp |= 1L << bit; bit += 1 }
    fp
  }
}

/** Codegen'd strict left-to-right dot product of two float/double arrays
  * (see [[VecNative.dot]] for the exactness contract). */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) null
    else VecNative.dot(a.asInstanceOf[ArrayData], isFloat(left),
      b.asInstanceOf[ArrayData], isFloat(right))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val box = ctx.freshName("vecDot")
    ev.copy(code = code"""
      ${l.code}
      ${r.code}
      boolean ${ev.isNull} = true;
      double ${ev.value} = 0.0;
      if (!${l.isNull} && !${r.isNull}) {
        java.lang.Double $box = graft.functions.VecNative.dot(
          ${l.value}, ${isFloat(left)}, ${r.value}, ${isFloat(right)});
        if ($box != null) { ${ev.isNull} = false; ${ev.value} = $box.doubleValue(); }
      }""")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
  override def prettyName: String = "vec_dot"
}

/** Codegen'd word n-gram shingling (see [[VecNative.shingles]]). */
case class TextShingles(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = left.nullable || right.nullable
  override protected def nullSafeEval(s: Any, n: Any): Any =
    VecNative.shingles(s.asInstanceOf[UTF8String], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, n) => s"graft.functions.VecNative.shingles($s, $n)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
  override def prettyName: String = "text_shingles"
}

/** Codegen'd 64-bit token SimHash (see [[VecNative.simhash64]]); null when
  * the text has no non-empty token. */
case class TextSimhash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else VecNative.simhash64(v.asInstanceOf[UTF8String])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val box = ctx.freshName("simhash")
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.isNull} = true;
      long ${ev.value} = 0L;
      if (!${c.isNull}) {
        java.lang.Long $box = graft.functions.VecNative.simhash64(${c.value});
        if ($box != null) { ${ev.isNull} = false; ${ev.value} = $box.longValue(); }
      }""")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "text_simhash"
}
