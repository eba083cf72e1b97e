package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression.
  *
  * Spark has no normalization builtin, yet it is the FIRST step of any
  * serious text-cleaning pipeline: the same visible string ("café")
  * arrives from the web both composed (U+00E9) and decomposed
  * (e + U+0301), and every downstream exact-dedup hash, shingle,
  * blocklist match, and tokenizer split sees them as different
  * documents unless normalized first. A UDF would pay the
  * serialization boundary per row on 100 TB of text; this expression
  * stays inside whole-stage codegen (one static `java.text.Normalizer`
  * call on the decoded string) and participates in null-safety like
  * any builtin. DuckDB's `nfc_normalize` is the oracle counterpart.
  *
  * Registered as SQL function `nfc_normalize` by
  * [[graft.ext.GraftExtensions]].
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string argument, got ${t.sql}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString,
      java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"java.text.Normalizer.normalize($c.toString(), " +
        "java.text.Normalizer.Form.NFC))")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[NfcNormalize].getName, null, "nfc_normalize",
    "_FUNC_(s) - Unicode NFC normalization of a string", "")
}
