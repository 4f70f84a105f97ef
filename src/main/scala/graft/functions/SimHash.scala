package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the `bits`-bit SimHash of a document —
  * for each bit j, the sign of the sum over tokens of
  * (2·bit_j(md5_32(token)) − 1), packed into a long.
  *
  * Replaces the explode + 32-conditional-sum hash aggregate
  * ([[graft.ops.Dedup.simHashSignatures]]'s original form): that shape
  * shuffles one row PER TOKEN into a group-by — at corpus scale the
  * token explode is orders of magnitude larger than the documents table,
  * and the whole volume crosses an exchange just to be summed back down
  * to one row per doc. This computes the signature in one narrow pass
  * (no explode, no shuffle): per token, one md5 and 32 counter bumps.
  *
  * Token semantics are exactly `split(text, " ")`: empty tokens between
  * consecutive spaces are real tokens; empty text is one empty token.
  * md5_32 = first 8 hex chars of the md5 parsed base-16 (DuckDB:
  * `CAST('0x'||substr(md5(w),1,8) AS BIGINT)`); ties (sum ≤ 0) clear
  * the bit, matching `CASE WHEN s > 0` on both engines. */
case class SimHash(child: Expression, bits: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if bits >= 1 && bits <= 64 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires 1 <= bits <= 64, got $bits")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash"

  override def nullSafeEval(input: Any): Any =
    SimHashUtil.simhash(input.asInstanceOf[UTF8String], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashUtil.simhash($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

object SimHashUtil {

  def simhash(s: UTF8String, bits: Int): Long = {
    val bytes = s.getBytes
    val md = MessageDigest.getInstance("MD5")
    val counts = new Array[Int](bits)
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == 0x20) {
        md.reset()
        md.update(bytes, start, i - start)
        val d = md.digest()
        // first 8 hex chars = bytes 0..3, big-endian (32-bit, positive)
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        var j = 0
        while (j < bits) {
          counts(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
        start = i + 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < bits) {
      if (counts(j) > 0) sig |= 1L << j
      j += 1
    }
    sig
  }
}

object SimHashFn {
  /** Column wrapper: `bits`-bit SimHash signature of `text`. */
  def apply(text: Column, bits: Int): Column =
    GraftBridge.column(SimHash(GraftBridge.expression(text), bits))
}
