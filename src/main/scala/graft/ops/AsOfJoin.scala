package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for every left row, attach the latest right row
  * with `right.ts <= left.ts` within the same key — the standard
  * event/quote alignment operator.
  *
  * Spark has no native as-of join; rather than a custom physical operator
  * this composes built-ins the scalable way: union both sides tagged, one
  * window sorted by (ts, side) per key carrying the last right values
  * forward, then keep left rows. Cost = ONE shuffle on the key (the same
  * exchange any join would need) + a per-partition sort; no range
  * explosion, no nested-loop. Ties (equal ts) resolve to the right row
  * (right sorts before left at equal ts), matching the `<=` contract.
  */
object AsOfJoin {

  /** @param left        probe side (keeps all rows)
    * @param right       reference side (values carried forward)
    * @param keys        equi-key columns present on both sides
    * @param tsCol       ordering column name (numeric or timestamp), on both
    * @param valueCols   right-side columns to attach (renamed as-is)
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // side: 0 = right (sorts first at equal ts -> inclusive <=), 1 = left;
    // unionByName fills each side's missing columns with typed nulls
    val l = left.withColumn("__side", lit(1))
    val r = right.select((keys :+ tsCol).map(col) ++ valueCols.map(c => col(c).as(s"__v_$c")): _*)
      .withColumn("__side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"__v_$c", last(col(s"__v_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++ valueCols.map(c => col(s"__v_$c").as(s"asof_$c")): _*)
  }
}
