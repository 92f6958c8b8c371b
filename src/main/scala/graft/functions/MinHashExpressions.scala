package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash lane minima — the signature stage of the LSH near-dup
  * pipeline as ONE fused loop.
  *
  * Semantics are bit-identical to the HOF formulation it replaces (and to
  * the DuckDB oracle's relational form): for seed s in [0, seeds), every
  * gram g contributes `md5("<s>:" + g)` (UTF-8), whose 32 lowercase hex
  * chars split into four 8-char lanes; lane j of the output is the
  * byte-lexicographic minimum over the row's grams (`least` on strings
  * compares UTF8String bytes — identical). Null grams are skipped (as
  * `least(acc, null)` skips), and an all-null/empty gram array yields the
  * fold identity "~" per lane (0x7e sorts above every hex char).
  *
  * Why native: `transform` + `aggregate` lambdas run interpreted
  * (CodegenFallback, per-element lambda frames, an intermediate 32-hex
  * UTF8String array per seed per row). Here each row makes one
  * MessageDigest, reused across grams and seeds, writes hex directly
  * into 8-byte lane buffers, and allocates only the k winning lanes.
  * Output: array<string> of `4 * seeds` lanes, ordered lane-major within
  * seed (element 4s+l = seed s, lane l) — matching `mh0..mh{k-1}`.
  */
case class MinHashLanes(child: Expression, seeds: Int) extends UnaryExpression {
  require(seeds >= 1 && seeds <= 64, s"seeds must be in [1, 64], got $seeds")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"min_hash_lanes expects array<string>, got $t")
  }

  override def nullSafeEval(a: Any): Any =
    MinHashLanesUtil.compute(a.asInstanceOf[ArrayData], seeds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashLanesUtil.compute($c, $seeds);")

  override protected def withNewChildInternal(newChild: Expression): MinHashLanes =
    copy(child = newChild)
}

object MinHashLanesUtil {
  private val Hex = "0123456789abcdef".getBytes("US-ASCII")
  private val Identity = UTF8String.fromString("~")

  /** One pass over the gram array: all `4 * seeds` lane minima. */
  def compute(arr: ArrayData, seeds: Int): ArrayData = {
    val k = seeds * 4
    val mins = new Array[Array[Byte]](k)
    val prefixes = Array.tabulate(seeds)(s => s"$s:".getBytes("UTF-8"))
    val md = MessageDigest.getInstance("MD5")
    val n = arr.numElements()
    var g = 0
    while (g < n) {
      if (!arr.isNullAt(g)) {
        val gb = arr.getUTF8String(g).getBytes
        var s = 0
        while (s < seeds) {
          md.reset()
          md.update(prefixes(s))
          md.update(gb)
          val dig = md.digest()
          var lane = 0
          while (lane < 4) {
            val idx = s * 4 + lane
            val cur = mins(idx)
            // compare the candidate's 8 hex chars against the current min
            // WITHOUT allocating: hex digits are in digest byte order
            var cmp = if (cur == null) -1 else 0
            var b = 0
            while (cmp == 0 && b < 4) {
              val v = dig(lane * 4 + b) & 0xff
              val hi = Hex(v >>> 4); val lo = Hex(v & 15)
              if (hi != cur(b * 2)) cmp = (hi & 0xff) - (cur(b * 2) & 0xff)
              else if (lo != cur(b * 2 + 1)) cmp = (lo & 0xff) - (cur(b * 2 + 1) & 0xff)
              b += 1
            }
            if (cmp < 0) {
              val hx = new Array[Byte](8)
              var j = 0
              while (j < 4) {
                val v = dig(lane * 4 + j) & 0xff
                hx(j * 2) = Hex(v >>> 4); hx(j * 2 + 1) = Hex(v & 15)
                j += 1
              }
              mins(idx) = hx
            }
            lane += 1
          }
          s += 1
        }
      }
      g += 1
    }
    val out = new Array[Any](k)
    var i = 0
    while (i < k) {
      out(i) = if (mins(i) == null) Identity else UTF8String.fromBytes(mins(i))
      i += 1
    }
    new GenericArrayData(out)
  }
}

object MinHashFunctions {
  /** codegen'd MinHash lane minima over an array<string> gram column. */
  def min_hash_lanes(grams: Column, seeds: Int): Column =
    ColumnBridge.column(MinHashLanes(ColumnBridge.expression(grams), seeds))
}
