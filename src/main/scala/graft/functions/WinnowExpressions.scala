package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `winnow_fingerprint(text, k, w)`: the full winnowing fingerprint pass
  * (Schleimer/Wilkerson/Aiken) as ONE native expression — hash every
  * k-code-point gram (first 16 md5 hex chars), slide a window of `w`
  * consecutive hashes, select each window's RIGHTMOST minimal hash;
  * returns the distinct selections as `array<struct<p int, h string>>`
  * (1-based gram positions, first-selected order).
  *
  * Why native end to end: the SQL formulation paid twice — interpreted
  * HOF overhead per window step, and Spark's `md5()` expression
  * instantiates a fresh MessageDigest PER CALL (~2.7M allocations for a
  * 9k-doc corpus, measured ~20 s of the pass). Here one digest is reused
  * across every gram of a task's rows and the selection is an O(m*w)
  * loop — the corpus pass drops to scan speed. `CodegenFallback` is
  * deliberate: the loop is already native.
  *
  * Exactness contract with the DuckDB oracle: grams are CODE-POINT
  * windows (both engines' substr semantics), hashed as UTF-8 bytes;
  * hex is lowercase; ties select the later position (`<=`). Inputs
  * shorter than k + w - 1 code points yield an empty array; null yields
  * null.
  */
case class WinnowFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 2 && w >= 2, s"need k >= 2 and w >= 2, got k=$k w=$w")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("p", IntegerType, nullable = false),
    StructField("h", StringType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprint expects string, got ${child.dataType}")

  // one digest per deserialized expression instance == per task: reuse
  // across every gram instead of a fresh MessageDigest per hash
  @transient private lazy val digest = java.security.MessageDigest.getInstance("MD5")
  private val HexBytes = "0123456789abcdef".getBytes("US-ASCII")

  override def nullSafeEval(input: Any): Any = {
    // one String round-trip per ROW (identical semantics to the previous
    // per-gram `new String(cps, i, k)` path, including invalid-sequence
    // replacement), then one UTF-8 byte array + a code-point -> byte
    // offset table so each gram is hashed straight off its byte slice —
    // no per-gram String/char[]/byte[] allocations
    val str = input.asInstanceOf[UTF8String].toString
    val bytes = str.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    // cumulative byte offset of each code point (offs(cpCount) = length)
    var cpCount = 0
    var ci = 0
    while (ci < str.length) {
      cpCount += 1
      ci += Character.charCount(str.codePointAt(ci))
    }
    val m = cpCount - k + 1
    if (m < w) return new GenericArrayData(Array.empty[Any])
    val offs = new Array[Int](cpCount + 1)
    ci = 0
    var cpi = 0
    var boff = 0
    while (ci < str.length) {
      offs(cpi) = boff
      val cp = str.codePointAt(ci)
      boff += (if (cp < 0x80) 1 else if (cp < 0x800) 2 else if (cp < 0x10000) 3 else 4)
      ci += Character.charCount(cp)
      cpi += 1
    }
    offs(cpCount) = boff
    // hash every gram once: first 8 md5 bytes, kept as a big-endian long —
    // unsigned long order IS the 16-lowercase-hex lexicographic order, so
    // the window selection compares primitives and hex materializes only
    // for the selected positions
    val hs = new Array[Long](m)
    val dig = new Array[Byte](16)
    var i = 0
    while (i < m) {
      digest.reset()
      digest.update(bytes, offs(i), offs(i + k) - offs(i))
      digest.digest(dig, 0, 16)
      var h = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (dig(b) & 0xffL); b += 1 }
      hs(i) = h
      i += 1
    }
    val seen = new java.util.LinkedHashSet[Integer]()
    var j = 0
    while (j <= m - w) {
      var bestP = j
      var bestH = hs(j)
      var x = j + 1
      while (x < j + w) {
        if (java.lang.Long.compareUnsigned(hs(x), bestH) <= 0) { bestH = hs(x); bestP = x }
        x += 1
      }
      seen.add(bestP)
      j += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var idx = 0
    while (it.hasNext) {
      val p = it.next().intValue()
      val h = hs(p)
      val hex = new Array[Byte](16)
      var b = 0
      while (b < 16) {
        hex(b) = HexBytes(((h >>> ((15 - b) * 4)) & 0xf).toInt)
        b += 1
      }
      out(idx) = InternalRow(p + 1, UTF8String.fromBytes(hex))
      idx += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprint =
    copy(child = newChild)
}

object WinnowFunctions {
  /** Column form of [[WinnowFingerprint]]. */
  def winnow_fingerprint(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowFingerprint(ColumnBridge.expression(text), k, w))
}
