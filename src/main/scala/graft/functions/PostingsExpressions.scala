package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `term_postings(tokens)`: per-row positional postings — one
  * (term, tf, positions) struct per DISTINCT non-empty token of the row,
  * positions being the ascending 1-based token offsets of that term.
  *
  * This is the per-document half of an inverted-index build computed
  * where it is free: every position of a (term, doc) posting lives in the
  * SAME input row, so grouping by (term, doc_id) is a per-row hash map,
  * not a cluster-wide aggregation. The relational form it replaces —
  * `posexplode(tokens)` then `groupBy(term, doc_id).agg(count, max(dl),
  * sort_array(collect_list(pos + 1)))` — pushed EVERY CORPUS TOKEN
  * through the runtime as a row and through an ObjectHashAggregate
  * exchange as a partially-built list buffer; here the token stream never
  * leaves the projection, and the only shuffle left in the build is the
  * term-range repartition the file layout actually needs.
  *
  * Exactness contract (mirrors the SQL form row for row):
  *  - null and empty-string tokens carry no posting (the SQL form's
  *    `char_length(term) > 0` filter, which also drops nulls);
  *  - tf equals the number of positions; positions are ascending because
  *    the row is walked left to right (sort_array over distinct ascending
  *    values is the identity);
  *  - struct order is first occurrence; consumers group or repartition by
  *    term, so order never reaches a result.
  */
case class TermPostings(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TermPostings.OutType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"term_postings expects array<string>, got $t")
  }

  override def nullSafeEval(a: Any): Any =
    PostingsUtil.termPostings(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PostingsUtil.termPostings($c);")

  override protected def withNewChildInternal(newChild: Expression): TermPostings =
    copy(child = newChild)
}

object TermPostings {
  val EntryType: StructType = StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("tf", LongType, nullable = false),
    StructField("positions", ArrayType(LongType, containsNull = false), nullable = false)))
  val OutType: DataType = ArrayType(EntryType, containsNull = false)
}

object PostingsUtil {
  /** One (term, tf, positions) row per distinct non-empty token —
    * see [[TermPostings]] for the contract. */
  def termPostings(toks: ArrayData): ArrayData = {
    val m = toks.numElements()
    // term -> growable position list; LinkedHashMap keeps first-occurrence
    // order so the output is deterministic
    val acc = new java.util.LinkedHashMap[UTF8String, java.util.ArrayList[Long]]()
    var i = 0
    while (i < m) {
      if (!toks.isNullAt(i)) {
        val t = toks.getUTF8String(i)
        if (t.numBytes() > 0) {
          var lst = acc.get(t)
          if (lst == null) { lst = new java.util.ArrayList[Long](4); acc.put(t, lst) }
          lst.add((i + 1).toLong): Unit
        }
      }
      i += 1
    }
    val out = new Array[Any](acc.size())
    val it = acc.entrySet().iterator()
    var idx = 0
    while (it.hasNext) {
      val e = it.next()
      val lst = e.getValue
      val pos = new Array[Long](lst.size())
      var k = 0
      while (k < pos.length) { pos(k) = lst.get(k); k += 1 }
      val row = new GenericInternalRow(3)
      row.update(0, e.getKey)
      row.setLong(1, pos.length.toLong)
      row.update(2, UnsafeArrayData.fromPrimitiveArray(pos))
      out(idx) = row.asInstanceOf[InternalRow]
      idx += 1
    }
    new GenericArrayData(out)
  }
}

object PostingsFunctions {
  /** Column form of [[TermPostings]]. */
  def term_postings(toks: Column): Column =
    ColumnBridge.column(TermPostings(ColumnBridge.expression(toks)))
}
