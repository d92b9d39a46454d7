package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** 16-bit SimHash over an array of (32-bit-ranged) token hashes: per bit
  * j, majority vote of the tokens' bit-j values (±1 contributions); the
  * output sets bit j iff the vote is positive, i.e. 2·ones_j > n.
  *
  * Exists for the same reason as [[DotProduct]] (SURVEY.md §7.4 preference
  * order): the HOF spelling — a 16-step fold whose body is another fold
  * over the token array — is interpreted per element with boxing, making
  * SimHash the single slowest query in the bench; this expression is one
  * tight primitive loop (16 popcount-style adds per token) inside
  * whole-stage codegen. Bitwise-identical to the HOF spelling (and the
  * DuckDB oracle, which keeps the naive form) — asserted in Simhash16Spec.
  *
  * Null semantics: null for a null array; token hashes are assumed
  * non-null (they come from md5 of non-null tokens).
  */
case class Simhash16(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash16 expects array<bigint>, got ${t.catalogString}")
    }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val ones = new Array[Int](16)
    var i = 0
    while (i < n) {
      val h = a.getLong(i)
      var j = 0
      while (j < 16) {
        ones(j) += ((h >> j) & 1L).toInt
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 16) {
      if (2 * ones(j) > n) out |= 1L << j
      j += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val ones = ctx.freshName("ones")
      val out = ctx.freshName("out")
      s"""
        int $n = $a.numElements();
        int[] $ones = new int[16];
        for (int $i = 0; $i < $n; $i++) {
          long $h = $a.getLong($i);
          for (int $j = 0; $j < 16; $j++) {
            $ones[$j] += (int) (($h >> $j) & 1L);
          }
        }
        long $out = 0L;
        for (int $j = 0; $j < 16; $j++) {
          if (2 * $ones[$j] > $n) $out |= 1L << $j;
        }
        ${ev.value} = $out;
      """
    })

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** Static (from generated Java's point of view: a top-level Scala object
  * gets static forwarders) kernel shared by [[FastTextBuckets]]'s
  * interpreted and codegen paths. */
object FastTextBucketsHelper {
  private val mdLocal =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** fastText hashed uni+bigram bucket ids for one token array.
    * h(w) = first 32 md5 bits (big-endian, unsigned — identical to
    * parsing the first 8 hex chars, i.e. graft.ops.md5hash32);
    * unigram bucket = h % nb; bigram bucket =
    * (h_i * 116049371 + h_{i+1}) % nb — fastText's computeNgrams word-
    * hash combination (Joulin et al. 2016), max product < 2^59.
    * One thread-local digest reused across tokens.
    * CONTRACT: token arrays must come from split()-style tokenization,
    * which never yields null elements. A null element hashes as the
    * empty string here, which DIVERGES from the oracle's per-element
    * NULL propagation (md5(NULL) -> NULL feature dropped by sum) — a
    * caller feeding a null-bearing array (collect_list of a nullable
    * column, array literals) is outside the contract and would break
    * the cross-engine hash match. */
  def compute(tokens: ArrayData, nb: Long): ArrayData = {
    val md = mdLocal.get()
    val n = tokens.numElements()
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      val d = md.digest(if (t == null) Array.emptyByteArray else t.getBytes)
      hs(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
              ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i += 1
    }
    val out = new Array[Long](if (n >= 2) 2 * n - 1 else n)
    i = 0
    while (i < n) { out(i) = hs(i) % nb; i += 1 }
    i = 0
    while (i < n - 1) {
      out(n + i) = (hs(i) * 116049371L + hs(i + 1)) % nb
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** fastText hashing-trick feature buckets (uni+bigram) of a token array —
  * see [[FastTextBucketsHelper.compute]] for the exact arithmetic, which
  * the DuckDB oracle and the R17/R18 brute-force laws mirror.
  *
  * Exists for the same reason as [[Simhash16]]: the HOF spelling
  * (transform(tok, t -> md5...) then a second transform for bigrams)
  * evaluates md5 on the interpreted lambda path — measured 5× slower
  * than the query's former concat-string spelling, while this kernel is
  * one digest per TOKEN (not per feature), no bigram string
  * materialization, and a single static call inside whole-stage codegen.
  */
case class FastTextBuckets(child: Expression, nBuckets: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"fasttext_buckets expects array<string>, got ${t.catalogString}")
    }

  override def nullSafeEval(v: Any): Any =
    FastTextBucketsHelper.compute(v.asInstanceOf[ArrayData], nBuckets)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = graft.functions.FastTextBucketsHelper
        .compute($a, ${nBuckets}L);
    """)

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** Static kernel shared by [[WindowHash60]]'s interpreted and codegen
  * paths. */
object WindowHash60Helper {
  private val mdLocal =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))
  private val Space = Array(' '.toByte)

  /** 60-bit rolling K-token window hashes of a token array: entry i is
    * md5hash60 of tokens i..i+K-1 joined by single spaces — byte-for-
    * byte the digest of concat_ws(" ", slice(tok, i+1, K)), whose first
    * 15 hex chars equal the first 8 digest bytes read big-endian >>> 4
    * (drop the 16th nibble). Token bytes are extracted once per row and
    * streamed into one reused digest per window; empty output for
    * n < K. Null elements are outside the contract (split() never
    * yields them) and hash as empty strings. */
  def compute(tokens: ArrayData, k: Int): ArrayData = {
    val md = mdLocal.get()
    val n = tokens.numElements()
    if (n < k) return new org.apache.spark.sql.catalyst.util
      .GenericArrayData(Array.emptyLongArray)
    val tb = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      tb(i) = if (t == null) Array.emptyByteArray else t.getBytes
      i += 1
    }
    val out = new Array[Long](n - k + 1)
    i = 0
    while (i <= n - k) {
      var j = 0
      while (j < k) {
        if (j > 0) md.update(Space)
        md.update(tb(i + j))
        j += 1
      }
      val d = md.digest()
      val b64 =
        ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      out(i) = b64 >>> 4
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Rolling K-token 60-bit window hashes — q_dedup_substring's window
  * explode input. Exists for the same reason as [[FastTextBuckets]]:
  * the transform(sequence(...), i -> md5hash60(concat_ws(...)))
  * spelling runs md5 + the window-string concat on the interpreted
  * lambda path per position; this kernel extracts token bytes once per
  * document and streams them into one reused digest inside whole-stage
  * codegen, materializing no window strings. Hash-identical to
  * graft.ops.md5hash60 over the joined window (WindowHash60Spec). */
case class WindowHash60(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"window_hash60 expects array<string>, got ${t.catalogString}")
    }

  override def nullSafeEval(v: Any): Any =
    WindowHash60Helper.compute(v.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = graft.functions.WindowHash60Helper.compute($a, $k);
    """)

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** Static kernel shared by [[CmBuckets]]'s interpreted and codegen paths. */
object CmBucketsHelper {
  private val mdLocal =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** Count-Min row buckets for one key string: the md5 digest's 4
    * disjoint 32-bit big-endian slices (hex chars r·8+1..r·8+8, i.e.
    * bytes 4r..4r+3), each mod `cells` — byte-for-byte the oracle's
    * CAST(('0x' || substr(md5(k), r*8+1, 8)) AS BIGINT) % cells and the
    * HOF spelling in graft.ops.cmBuckets, FOR NON-NULL KEYS. On a NULL
    * key the expression is null-strict (NULL array -> explode drops the
    * row) while the HOF/oracle spelling null-propagates per element
    * (four (r, NULL) rows) — pinned in CmBucketsSpec; every production
    * call site keys on a non-null fixture column. */
  def compute(key: org.apache.spark.unsafe.types.UTF8String,
              cells: Int): ArrayData = {
    val d = mdLocal.get().digest(key.getBytes)
    val out = new Array[Long](4)
    var r = 0
    while (r < 4) {
      val h = ((d(4 * r) & 0xffL) << 24) | ((d(4 * r + 1) & 0xffL) << 16) |
              ((d(4 * r + 2) & 0xffL) << 8) | (d(4 * r + 3) & 0xffL)
      out(r) = h % cells
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Count-Min sketch row buckets of a key string — see
  * [[CmBucketsHelper.compute]]. Exists for the same reason as
  * [[FastTextBuckets]]: the HOF spelling (transform over 4 interpreted
  * conv(substr(digest)) lambdas per row) dominates the sketch build's
  * scan at corpus scale; this is one digest + 4 shifts inside
  * whole-stage codegen. The HOF form stays in graft.ops as the
  * reference both the DuckDB oracle and CmBucketsSpec mirror. */
case class CmBuckets(child: Expression, cells: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cm_buckets expects string, got ${t.catalogString}")
    }

  override def nullSafeEval(v: Any): Any =
    CmBucketsHelper.compute(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], cells)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = graft.functions.CmBucketsHelper.compute($a, $cells);
    """)

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object TextFunctions {
  /** 16-bit majority-vote SimHash of an array of token hashes. */
  def simhash16(hashes: Column): Column =
    Shim.toColumn(Simhash16(Shim.toExpression(hashes)))

  /** Count-Min row buckets (4 md5 slices mod cells) of a key string. */
  def cmBucketsNative(key: Column, cells: Int): Column =
    Shim.toColumn(CmBuckets(Shim.toExpression(key), cells))

  /** Rolling K-token 60-bit md5 window hashes of a token array. */
  def windowHash60(tokens: Column, k: Int): Column =
    Shim.toColumn(WindowHash60(Shim.toExpression(tokens), k))

  /** fastText uni+bigram hash buckets of a token array (mod nBuckets). */
  def fasttextBuckets(tokens: Column, nBuckets: Long): Column =
    Shim.toColumn(FastTextBuckets(Shim.toExpression(tokens), nBuckets))
}
