package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering keys for multi-column data layout.
  *
  * A table sorted by one column prunes beautifully on that column and not
  * at all on any other; interleaving the bits of several stats-scaled
  * columns gives every participating column locality, so zone-map file
  * skipping ([[graft.meta.FileEntry.mayContainRange]]) cuts file counts on
  * ANY of them. This is the layout half of Iceberg's
  * `rewrite_data_files(strategy => 'sort', sort_order => 'zorder(a, b)')`,
  * built from plain Spark bit expressions (shift/and/or — whole-stage
  * codegen'd, no UDF).
  *
  * Mechanics: each column is scaled to a `bits`-bit bucket ordinal over
  * its [min, max] domain (domains come from manifest zone maps during
  * compaction — free — or one agg pass on ingest), then bit i of column j
  * lands at position `i * ncols + j` of the key. NULLs bucket to 0 (sort
  * first within the key). `ncols * bits` must fit a signed long.
  */
object ZOrder {

  val DefaultBits = 16

  private val Pattern = """zorder\(([^)]+)\)""".r

  /** The inner columns of a `"zorder(a, b, ...)"` sort-field name; None
    * for plain column names. This string form rides in
    * [[graft.meta.SortField]] unchanged, so the metadata codec and every
    * API that carries a sort order work untouched. */
  def columnsOf(sortColumn: String): Option[Seq[String]] = sortColumn match {
    case Pattern(inner) => Some(inner.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    case _ => None
  }

  def sortField(cols: String*): String = s"zorder(${cols.mkString(", ")})"

  /** `bits`-bit bucket ordinal of `c` over [min, max]; NULL and
    * out-of-domain values clamp into range (degenerate domains bucket to
    * 0 — the column then contributes nothing, which is correct: it has
    * one value). */
  def scaledBucket(c: Column, min: BigDecimal, max: BigDecimal, bits: Int = DefaultBits): Column = {
    val buckets = 1L << bits
    val range = (max - min).toDouble
    if (range <= 0) lit(0L)
    else least(greatest(
      floor((coalesce(c.cast("double"), lit(min.toDouble)) - min.toDouble)
        / range * buckets).cast("long"),
      lit(0L)), lit(buckets - 1))
  }

  /** Bit-interleave of bucket columns: bit i of bucket j -> key bit
    * `i * n + j`. Pure shift/and/or tree, codegen'd. */
  def interleaved(buckets: Seq[Column], bits: Int = DefaultBits): Column = {
    require(buckets.nonEmpty, "zorder needs at least one column")
    require(buckets.size * bits <= 63,
      s"zorder key ${buckets.size} cols x $bits bits exceeds a signed long")
    val n = buckets.size
    val terms = for {
      (b, j) <- buckets.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** The full z-value for (column, domain) specs. */
  def zvalue(cols: Seq[(Column, (BigDecimal, BigDecimal))], bits: Int = DefaultBits): Column =
    interleaved(cols.map { case (c, (mn, mx)) => scaledBucket(c, mn, mx, bits) }, bits)

  /** Driver-side reference implementation (spec oracle). */
  def interleaveRef(values: Seq[Long], bits: Int = DefaultBits): Long = {
    val n = values.size
    var out = 0L
    for ((v, j) <- values.zipWithIndex; i <- 0 until bits)
      out |= ((v >> i) & 1L) << (i * n + j)
    out
  }
}
