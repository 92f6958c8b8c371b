package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word-shingle projections — the per-row hot loop of every MinHash
  * line (d2/d10/d12/i2 and the skew trio) fused out of interpreted
  * higher-order-function chains.
  *
  * The SQL formulation they replace,
  * `array_distinct(transform(sequence(1, greatest(size(t) - (n-1), 1)),
  * i -> concat_ws(' ', slice(t, i, n))))` and
  * `array_sort(array_distinct(transform(g, x -> xxhash64(x))))`, runs the
  * lambda interpreted per WINDOW per row (sequence array + slice array +
  * lambda frames + an intermediate element per step). Here each row is one
  * loop: windows materialize straight off the token array, dedup happens
  * in a single hash set, and hashing calls the same XXH64 primitive
  * Spark's `xxhash64` codegen calls.
  *
  * Exactness contract (property-pinned against the SQL forms):
  *  - window i (1-based) covers tokens i .. min(i+n-1, m); the window
  *    count is max(m - n + 1, 1), so m < n yields ONE short window and an
  *    empty token array yields [""] (concat_ws of nothing) — identical to
  *    slice/concat_ws semantics, null tokens skipped like concat_ws;
  *  - distinct preserves first occurrence (array_distinct), irrelevant to
  *    consumers (min over lanes; sorted set) but kept identical anyway;
  *  - hashes are `XXH64.hashUTF8String(s, 42L)` — bit-identical to
  *    Spark's `xxhash64(s)`; a null element hashes to the seed exactly as
  *    `xxhash64(NULL)` does; the set is ascending-sorted distinct longs,
  *    identical to array_sort(array_distinct(...)).
  */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"word_ngrams expects array<string>, got $t")
  }

  override def nullSafeEval(a: Any): Any =
    ShingleUtil.wordNgrams(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleUtil.wordNgrams($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

/** `xxhash64_sorted_set(grams)`: ascending-sorted distinct xxhash64 values
  * of a string array — the per-row set representation the sorted-merge
  * verify tests consume. See [[WordNgrams]] for the exactness contract. */
case class XxHash64SortedSet(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"xxhash64_sorted_set expects array<string>, got $t")
  }

  override def nullSafeEval(a: Any): Any =
    ShingleUtil.xxhash64SortedSet(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleUtil.xxhash64SortedSet($c);")

  override protected def withNewChildInternal(newChild: Expression): XxHash64SortedSet =
    copy(child = newChild)
}

/** `char_ngram_hash_set(text, n)`: ascending-sorted distinct xxhash64 of
  * the char n-gram windows of a string — the fused form of
  * `array_sort(array_distinct(transform(array_distinct(transform(
  * sequence(1, greatest(length(t) - (n-2), 1)), i -> substring(t, i, n))),
  * g -> xxhash64(g))))`, [[graft.ops.Dedup.charGramSets]]' projection.
  *
  * Beyond the lambda overhead, the SQL form is O(len^2) PER ROW:
  * `substring(t, i, n)` locates code point i by scanning from the start
  * of the string on every window. Here one pass records the byte offset
  * of every code point and each window hashes straight off its byte
  * slice — O(len), zero per-gram allocations. Window semantics replicate
  * the SQL form exactly, including its short tail window (starts run to
  * len - n + 2, so the last gram has n-1 code points) and the single
  * degenerate window of a too-short string. */
case class CharNgramHashSet(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 2, s"char shingle width must be >= 2, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"char_ngram_hash_set expects string, got $t")
  }

  override def nullSafeEval(a: Any): Any =
    ShingleUtil.charNgramHashSet(a.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleUtil.charNgramHashSet($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): CharNgramHashSet =
    copy(child = newChild)
}

object ShingleUtil {
  private val Space = UTF8String.fromString(" ")

  /** Sorted distinct xxhash64 of char n-gram windows — see
    * [[CharNgramHashSet]] for the exact window contract. */
  def charNgramHashSet(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    // byte offset of each code point (UTF-8 lead bytes), plus the end
    var cpCount = 0
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) cpCount += 1
      i += 1
    }
    val offs = new Array[Int](cpCount + 1)
    var cpi = 0
    i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) { offs(cpi) = i; cpi += 1 }
      i += 1
    }
    offs(cpCount) = bytes.length
    // windows start at code points 0 .. max(cpCount - n + 1, 0) inclusive
    // (the SQL form's sequence(1, greatest(len - (n-2), 1)) in 0-based)
    val count = math.max(cpCount - n + 2, 1)
    val hs = new Array[Long](count)
    i = 0
    while (i < count) {
      val start = offs(i)
      val end = offs(math.min(i + n, cpCount))
      hs(i) = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + start, end - start, 42L)
      i += 1
    }
    java.util.Arrays.sort(hs)
    var w = 0
    i = 0
    while (i < count) {
      if (w == 0 || hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    val out = new Array[Long](w)
    System.arraycopy(hs, 0, out, 0, w)
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Distinct n-token windows of a token array, first-occurrence order. */
  def wordNgrams(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    val count = math.max(m - n + 1, 1)
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val buf = new Array[UTF8String](n)
    var i = 0
    while (i < count) {
      val end = math.min(i + n, m)
      var w = 0
      var k = i
      while (k < end) {
        // concat_ws skips nulls; UTF8String.concatWs(sep, null) would too,
        // but dropping them here keeps the varargs array dense
        if (!toks.isNullAt(k)) { buf(w) = toks.getUTF8String(k); w += 1 }
        k += 1
      }
      val gram =
        if (w == n) UTF8String.concatWs(Space, buf: _*)
        else UTF8String.concatWs(Space, java.util.Arrays.copyOf(buf, w): _*)
      seen.add(gram)
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var idx = 0
    while (it.hasNext) { out(idx) = it.next(); idx += 1 }
    new GenericArrayData(out)
  }

  /** Ascending-sorted distinct xxhash64(seed 42) of a string array. */
  def xxhash64SortedSet(grams: ArrayData): ArrayData = {
    val m = grams.numElements()
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      // xxhash64(NULL) leaves the seed unchanged — mirror it
      hs(i) = if (grams.isNullAt(i)) 42L
        else XXH64.hashUTF8String(grams.getUTF8String(i), 42L)
      i += 1
    }
    java.util.Arrays.sort(hs)
    // dedupe in place on the sorted array
    var w = 0
    i = 0
    while (i < m) {
      if (w == 0 || hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    val out = new Array[Long](w)
    System.arraycopy(hs, 0, out, 0, w)
    // UnsafeArrayData: unboxed storage, so downstream getLong in the
    // sorted-merge tests reads primitives (GenericArrayData would box)
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }
}

object ShingleFunctions {
  /** Column form of [[WordNgrams]]. */
  def word_ngrams(toks: Column, n: Int): Column =
    ColumnBridge.column(WordNgrams(ColumnBridge.expression(toks), n))

  /** Column form of [[XxHash64SortedSet]]. */
  def xxhash64_sorted_set(grams: Column): Column =
    ColumnBridge.column(XxHash64SortedSet(ColumnBridge.expression(grams)))

  /** Column form of [[CharNgramHashSet]]. */
  def char_ngram_hash_set(text: Column, n: Int): Column =
    ColumnBridge.column(CharNgramHashSet(ColumnBridge.expression(text), n))
}
