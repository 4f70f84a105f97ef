package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: the k-permutation MinHash signature of a
  * shingle-hash array ([[ShingleHashes]] output) — for each permutation
  * i, the minimum of `((h mod p)·(2i+1) + 12289·(i+1)) mod p` over the
  * array, p = 2³¹−1 ([[graft.ops.Dedup.MinHashP]]; all arithmetic exact
  * in 64-bit on both engines).
  *
  * Replaces the explode + k-min hash aggregate: that form shuffles one
  * row per SHINGLE into a group-by just to collapse back to one row per
  * document — at corpus scale the exploded shingle table dwarfs the
  * documents table. This folds the k minima in one narrow pass over the
  * array already produced in the same projection. */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires k >= 1, got $k")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashSigUtil.sig(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSigUtil.sig($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSigUtil {
  /** 2³¹−1; (p−1)·(2k−1) + 12289·k stays < 2⁶³ for any practical k. */
  val P = 2147483647L

  /** k-permutation signature; an empty array yields all-p (no shingle
    * beats the identity minimum — callers filter empty docs out first,
    * matching the group-by form where such docs simply had no rows).
    * Null slots (reachable via the SQL-registered function with a
    * nullable array<bigint>, never from [[ShingleHashes]] output) are
    * skipped, matching what the explode+min group-by form did with
    * null shingle hashes. */
  def sig(hashes: ArrayData, k: Int): ArrayData = {
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, P)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      if (!hashes.isNullAt(i)) {
        val hp = hashes.getLong(i) % P
        var j = 0
        while (j < k) {
          val v = (hp * (2 * j + 1) + 12289L * (j + 1)) % P
          if (v < out(j)) out(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

object MinHashSigFn {
  /** Column wrapper: k-permutation MinHash signature of a shingle-hash array. */
  def apply(shingleHashes: Column, k: Int): Column =
    GraftBridge.column(MinHashSig(GraftBridge.expression(shingleHashes), k))
}
