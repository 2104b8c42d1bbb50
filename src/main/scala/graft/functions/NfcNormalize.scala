package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Unicode NFC normalization of a string column.
  *
  * Web-scraped training corpora carry the same glyph in several byte
  * encodings (é as U+00E9 vs e + U+0301 combining accent, full
  * compatibility ligatures, etc.) — every dedup fingerprint, shingle,
  * and tokenizer upstream of this engine sees those as DIFFERENT
  * strings unless the corpus is canonicalized first, so NFC
  * normalization is the step-zero transform of a text pipeline. Spark
  * has no built-in; a native Expression keeps it inside whole-stage
  * codegen (a Scala UDF would re-box every row). The heavy lifting is
  * `java.text.Normalizer` — ICU-grade tables in the JDK, no library
  * dependency — and DuckDB's `nfc_normalize` implements the identical
  * Unicode algorithm, which is what makes the oracle row possible.
  *
  * Fast path: `Normalizer.isNormalized` is O(n) with no allocation for
  * the overwhelmingly-common already-NFC input, so the full
  * normalize-and-rebuild only runs on rows that need it.
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      NfcNormalizeExpr.normalize(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.functions.NfcNormalizeExpr.normalize($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}

object NfcNormalizeExpr {
  /** Static helper the generated code calls — isNormalized fast path. */
  def normalize(s: String): String =
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) s
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)

  /** Column-API form. */
  def apply(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftShims.column(NfcNormalizeExpr(
      org.apache.spark.sql.GraftShims.expression(c)))
}
