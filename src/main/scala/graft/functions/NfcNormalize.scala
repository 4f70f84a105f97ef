package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode NFC normalization of a string —
  * the canonicalization step every text-dedup pipeline needs BEFORE
  * hashing (the same logical text arrives as precomposed é or as
  * e + COMBINING ACUTE from different crawls; byte-level md5/minhash
  * treats them as different documents, silently deflating dedup
  * recall). Spark ships no normalization function; a Scala UDF would
  * fall out of codegen — this is one generated static call per row
  * ([[graft.functions.JlProjectInt8]] pattern, no reference objects
  * needed).
  *
  * Exactly `java.text.Normalizer.normalize(s, NFC)` (the Unicode
  * standard algorithm — DuckDB's `nfc_normalize` mirrors it, which is
  * what lets the oracle confirm the full normalization chain). Null in
  * → null out. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.sql}")
  }
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalizeUtil.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalizeUtil.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalizeUtil {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    // the common case is already-NFC text: isNormalized is a cheap
    // scan that skips the allocation-heavy normalize call
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

object NfcNormalizeFn {
  def apply(c: Column): Column =
    GraftBridge.column(NfcNormalize(GraftBridge.expression(c)))
}
