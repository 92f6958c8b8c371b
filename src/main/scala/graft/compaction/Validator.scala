package graft.compaction

import org.apache.spark.sql.SparkSession

import graft.meta.{FileEntry, SchemaField}
import graft.selection.FileGroup
import graft.exec.Mor

/** Post-commit validation: re-run the MOR query over the inputs and compare
  * its row count with a plain scan of the outputs
  * (core/src/compaction/validator.rs:37-177). Counts, not hashes — same
  * contract as the reference. */
object Validator {
  final case class ValidationFailure(inputRows: Long, outputRows: Long)
      extends RuntimeException(
        s"compaction validation failed: input MOR rows $inputRows != output rows $outputRows")

  def validate(
      spark: SparkSession,
      inputGroup: FileGroup,
      outputFiles: Seq[FileEntry],
      schemaColumns: Seq[String],
      formatVersion: Int,
      tableSchema: Seq[SchemaField] = Nil
  ): Unit = {
    // metadataAggregates=false: the input count must come from an actual
    // scan — answering it from manifest recordCounts would compare
    // recorded statistics against output counts instead of independently
    // re-reading the data, which is the invariant this validator exists
    // to enforce
    val inputRows = Mor.dataFrame(spark, inputGroup, schemaColumns, formatVersion, tableSchema,
      metadataAggregates = false).count()
    val outputRows =
      if (outputFiles.isEmpty) 0L
      else spark.read.parquet(outputFiles.map(_.path): _*).count()
    if (inputRows != outputRows) throw ValidationFailure(inputRows, outputRows)
  }

  final case class ContentValidationFailure(missingFromOutput: Long, extraInOutput: Long)
      extends RuntimeException(
        s"compaction content validation failed: $missingFromOutput rows missing from output, " +
          s"$extraInOutput unexpected rows in output")

  /** Stronger, opt-in check than the reference's count contract: the
    * output must be the exact multiset of the input MOR rows (two anti
    * joins — it shuffles both sides once, so it costs a comparison join,
    * not a full rewrite; run it on suspicion, not on every commit). */
  def validateContent(
      spark: SparkSession,
      inputGroup: FileGroup,
      outputFiles: Seq[FileEntry],
      schemaColumns: Seq[String],
      formatVersion: Int,
      tableSchema: Seq[SchemaField] = Nil
  ): Unit = {
    val input = Mor.dataFrame(spark, inputGroup, schemaColumns, formatVersion, tableSchema)
    val output =
      if (outputFiles.isEmpty) input.limit(0)
      else spark.read.parquet(outputFiles.map(_.path): _*)
        .select(schemaColumns.map(org.apache.spark.sql.functions.col): _*)
    val missing = input.exceptAll(output).count()
    val extra = output.exceptAll(input).count()
    if (missing != 0L || extra != 0L) throw ContentValidationFailure(missing, extra)
  }
}
