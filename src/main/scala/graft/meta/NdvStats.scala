package graft.meta

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

/** Distinct-value statistics for Iceberg interop: one distributed pass
  * builds a [[ThetaSketch]] per supported column (per-partition sketches,
  * driver merge — sketch state is bounded at `nominal` hashes, so the
  * collect is KBs regardless of table size). [[IcebergExport]] writes
  * them as Puffin `apache-datasketches-theta-v1` blobs referenced from
  * the metadata `statistics` list, which is where external engines' CBOs
  * look for NDV. */
object NdvStats {

  /** Types with an Iceberg single-value binary encoding this sketches. */
  def supported(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | DateType | TimestampType | StringType |
         BooleanType => true
    case d: DecimalType => d.precision <= 38
    case _ => false
  }

  /** Sketches every supported column (or `cols`) of the CURRENT
    * snapshot. Column name -> sketch. */
  def compute(spark: SparkSession, catalog: Catalog, name: String,
      cols: Seq[String] = Nil): Map[String, ThetaSketch] = {
    val df0 = IceRead.table(spark, catalog, name)
    val target = (if (cols.nonEmpty) cols else df0.columns.toSeq)
      .filter(c => df0.schema.fields.find(_.name == c).exists(f => supported(f.dataType)))
    if (target.isEmpty) return Map.empty
    val df = df0.select(target.map(org.apache.spark.sql.functions.col): _*)
    val dts = df.schema.fields.map(_.dataType)

    def upd(s: ThetaSketch, dt: DataType, r: Row, i: Int): Unit = dt match {
      // ints/dates promote to long; timestamps are micros — the same
      // single-value encoding rules the bucket transform hashes
      case IntegerType | DateType => s.updateLong(r.getAs[Any](i) match {
        case d: java.sql.Date => d.toLocalDate.toEpochDay
        case d: java.time.LocalDate => d.toEpochDay // datetime.java8API sessions
        case n: Int => n.toLong
        case n: Number => n.longValue()
      })
      case LongType => s.updateLong(r.getLong(i))
      case TimestampType => s.updateLong(r.getAs[Any](i) match {
        case t: java.sql.Timestamp => t.getTime * 1000L + (t.getNanos / 1000) % 1000
        case t: java.time.Instant => // datetime.java8API sessions
          t.getEpochSecond * 1000000L + t.getNano / 1000
        case n: Number => n.longValue()
      })
      case StringType => s.updateString(r.getString(i))
      case BooleanType => s.updateBytes(Array[Byte](if (r.getBoolean(i)) 1 else 0))
      case _: DecimalType =>
        s.updateBytes(r.getDecimal(i).unscaledValue.toByteArray)
      case _ => ()
    }

    val partials: Array[Array[Array[Byte]]] = df.rdd.mapPartitions { rows =>
      val sketches = Array.fill(dts.length)(ThetaSketch.empty())
      rows.foreach { r =>
        var i = 0
        while (i < dts.length) {
          if (!r.isNullAt(i)) upd(sketches(i), dts(i), r, i)
          i += 1
        }
      }
      Iterator.single(sketches.map(_.serialize))
    }.collect()

    val merged = partials.foldLeft(Array.fill(dts.length)(ThetaSketch.empty())) {
      (acc, part) => acc.zip(part).map { case (a, b) => a.merge(ThetaSketch.deserialize(b)) }
    }
    target.zip(merged).toMap
  }
}
