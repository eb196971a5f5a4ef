package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.graft.SqlBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Unicode NFC normalization — the
  * canonical-composition pass every multilingual training-data pipeline
  * runs before hashing/dedup (a decomposed "é" and a composed
  * "é" must collapse to one byte sequence, or exact dedup, MinHash
  * shingles, and token counts all silently treat equal texts as
  * different).
  *
  * Why an Expression and not a UDF: stays inside WholeStageCodegen (no
  * Row conversion, no serialization penalty), and the common case —
  * text already in NFC, which Normalizer.isNormalized answers via the
  * quick-check property without allocating — returns the input
  * UTF8String untouched. Only genuinely decomposed strings pay the
  * String round-trip. DuckDB's nfc_normalize provides the oracle.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // one static call on the Scala object's forwarder — the quick-check
    // fast path runs inside it, so the generated code stays a leaf call
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  /** NFC-normalize one UTF8String; identity (no allocation beyond the
    * quick-check walk) when the input is already composed. Called from
    * generated code via the static forwarder. */
  def nfc(s: UTF8String): UTF8String = {
    val j = s.toString
    if (Normalizer.isNormalized(j, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(j, Normalizer.Form.NFC))
  }

  /** Column-API entry point — usable without any registration. */
  def nfcNormalize(c: Column): Column =
    SqlBridge.column(NfcNormalize(SqlBridge.expression(c)))

  private[functions] val info = new ExpressionInfo(
    classOf[NfcNormalize].getCanonicalName, "nfc_normalize")

  private[functions] def build(children: Seq[Expression]): Expression = {
    require(children.length == 1, "nfc_normalize expects 1 argument")
    NfcNormalize(children.head)
  }

  /** Make `nfc_normalize` callable from SQL on an existing session (for
    * sessions not built with the extensions config). Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize", build, "built-in")
}
