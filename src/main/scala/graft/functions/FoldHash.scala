package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: rolling-hash document fingerprint —
  * fold `(acc * 31 + (md5_60(word) mod p)) mod p` over the document's
  * single-space-separated words, in order.
  *
  * Replaces the `aggregate(transform(split(...)))` higher-order-function
  * form ([[graft.ops.TextAnalysis.fingerprint]]): HOFs evaluate their
  * lambda per element through interpreted `NamedLambdaVariable`s outside
  * whole-stage codegen — the same pattern [[CosineSim]] replaced for a
  * measured ~20× win. This compiles to one static call per row; the word
  * split happens on the raw UTF-8 bytes with zero per-word string
  * allocation (0x20 never occurs inside a multi-byte UTF-8 sequence).
  *
  * Semantics are bit-identical to the HOF form and the DuckDB twin
  * (`list_reduce(list_prepend(0, list_transform(string_split(text,' '),
  * w -> md5_60(w) % p)), (acc,h) -> (acc*31+h) % p)`): empty text is one
  * empty word, consecutive spaces yield empty words, md5_60 = first 15
  * hex chars of the md5 digest parsed base-16 (60 bits, positive).
  */
case class FoldHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "fold_hash"

  override def nullSafeEval(input: Any): Any =
    FoldHashUtil.fold(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FoldHashUtil.fold($c)")

  override protected def withNewChildInternal(newChild: Expression): FoldHash =
    copy(child = newChild)
}

/** Static helper (no companion class → javac-visible static forwarder,
  * callable from generated Java). */
object FoldHashUtil {
  /** Fold modulus (1e9+7); keeps acc*31 + h < 2^63 exact in 64-bit. */
  val P = 1000000007L

  def fold(s: UTF8String): Long = {
    val bytes = s.getBytes
    val md = MessageDigest.getInstance("MD5")
    var acc = 0L
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == 0x20) {
        md.reset()
        md.update(bytes, start, i - start)
        val d = md.digest()
        // first 15 hex chars = bytes 0..6 (14 chars) + high nibble of byte 7
        var h = 0L
        var j = 0
        while (j < 7) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
        h = (h << 4) | ((d(7) & 0xf0L) >>> 4)
        acc = (acc * 31L + h % P) % P
        start = i + 1
      }
      i += 1
    }
    acc
  }
}

object FoldHashFn {
  /** Column wrapper. */
  def apply(text: Column): Column =
    GraftBridge.column(FoldHash(GraftBridge.expression(text)))
}
