package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `unicode_normalize(text, form)`: Unicode normalization (NFC/NFKC/NFD/
  * NFKD) as a native codegen'd expression.
  *
  * Web-crawl text arrives in mixed normalization (decomposed accents from
  * mac filesystems, compatibility ligatures from PDF extraction), and
  * every downstream dedup/fingerprint operator hashes bytes — so two
  * canonically-equal strings that differ in code-point sequence would
  * dodge exact dedup and poison n-gram stats. Normalizing first makes the
  * byte hash a canonical-equivalence hash.
  *
  * Spark has no built-in for this (`lower`/`trim` don't touch combining
  * marks), and a Scala UDF would box every row and block whole-stage
  * codegen in exactly the per-row projection pipelines (t1–t8) where this
  * runs. The expression stays inside WholeStageCodegen: the generated code
  * calls `Normalizer.isNormalized` first, so the common case (already-NFC
  * ASCII/UTF-8 prose) is a single scan with zero allocation, and only rows
  * that actually need rewriting pay for `Normalizer.normalize` + re-encode.
  *
  * Cross-engine determinism: Unicode normalization forms are a stable
  * public spec (UAX #15); DuckDB's `nfc_normalize` and the JDK agree on
  * NFC output for any input, so NFC results are hash-checkable against the
  * SQL oracle (query t12).
  */
case class UnicodeNormalize(child: Expression, formName: String) extends UnaryExpression {
  require(Set("NFC", "NFKC", "NFD", "NFKD")(formName),
    s"unknown normalization form $formName")

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"unicode_normalize expects a string input, got $t")
    }

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalize.normalize(input.asInstanceOf[UTF8String], formName)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = UnicodeNormalize.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, s =>
      s"""${ev.value} = $cls.normalize($s, "$formName");""")
  }

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {
  /** Shared by interpreted and generated code paths. `isNormalized` is a
    * read-only scan (true for virtually all real rows) — the decode +
    * normalize + encode round trip runs only when it must. */
  def normalize(s: UTF8String, formName: String): UTF8String = {
    val form = Normalizer.Form.valueOf(formName)
    val str = s.toString
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }
}

object UnicodeFunctions {
  /** canonical composition — the form dedup pipelines want (and the one
    * DuckDB's `nfc_normalize` oracle can hash-check). */
  def nfc(text: Column): Column = normalize(text, "NFC")

  /** compatibility composition: also folds ligatures/width/super-scripts —
    * lossier, standard for tokenizer-facing text. */
  def nfkc(text: Column): Column = normalize(text, "NFKC")

  def normalize(text: Column, form: String): Column =
    ColumnBridge.column(UnicodeNormalize(ColumnBridge.expression(text), form))
}
