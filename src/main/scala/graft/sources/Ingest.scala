package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Text-format ingest with corrupt-record QUARANTINE — the front door a
  * crawl pipeline needs before any parquet exists: a malformed line must
  * neither kill the job (FAILFAST) nor silently vanish (DROPMALFORMED);
  * it lands in a quarantine frame carrying the raw line, so the bad
  * input is inspectable and replayable after a parser fix.
  *
  * Implementation: ONE line-oriented text scan; parsing happens in
  * `from_json` / `from_csv` with an explicit schema (never inference —
  * at 100 TB, inference is an extra full scan and a correctness hazard)
  * plus a corrupt-capture column. Parsing per-row over a text relation
  * also sidesteps Spark's corrupt-only-query restriction on raw JSON/CSV
  * sources, so the quarantine frame needs no caching. Both outputs are
  * narrow projections of the same scan.
  */
object Ingest {

  val CorruptCol = "_corrupt"

  private def withCorrupt(schema: StructType): StructType = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema already has a $CorruptCol column")
    StructType(schema.fields :+ StructField(CorruptCol, StringType))
  }

  private val corruptOptions = Map(
    "mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptCol)

  private def split(parsed: DataFrame, schema: StructType): (DataFrame, DataFrame) = {
    val good = parsed.filter(col(s"p.$CorruptCol").isNull)
      .select(schema.fieldNames.map(n => col(s"p.$n")).toSeq: _*)
    val bad = parsed.filter(col(s"p.$CorruptCol").isNotNull)
      .select(col("value").as("raw_line"))
    (good, bad)
  }

  /** JSON-lines ingest: one JSON document per line. Returns
    * (good rows with the declared schema, quarantined raw lines). */
  def jsonl(spark: SparkSession, path: String, schema: StructType): (DataFrame, DataFrame) = {
    val parseSchema = withCorrupt(schema) // validate before touching the path
    split(spark.read.text(path)
      .select(col("value"),
        from_json(col("value"), parseSchema, corruptOptions).as("p")),
      schema)
  }

  /** Headerless CSV ingest (write shards without headers — a header line
    * is indistinguishable from data once files concatenate). */
  def csv(spark: SparkSession, path: String, schema: StructType): (DataFrame, DataFrame) = {
    val parseSchema = withCorrupt(schema)
    split(spark.read.text(path)
      .select(col("value"),
        from_csv(col("value"), parseSchema, corruptOptions).as("p")),
      schema)
  }
}
