package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, ByteType, DataType, DoubleType}

/** Native Catalyst expression: cosine similarity of two INT8 (quantized)
  * vectors — the coarse-scoring kernel for quantized ANN
  * ([[graft.ops.Similarity.quantizeInt8]] produces the vectors,
  * [[graft.ops.Similarity.knnJoinQuantized]] runs this inside the
  * LSH-bucket candidate join, its hot loop). Like [[CosineSim]] this
  * compiles into whole-stage codegen as one fused pass, but the loads
  * are 1-byte and the accumulators are exact LONGs (|dot| ≤ 127²·dim —
  * overflow needs dims > 2^45): the per-vector quantization scales
  * cancel in the cosine, so the quantized direction stands in for the
  * full-precision one at a quarter of the memory traffic.
  *
  * Cross-engine exactness: every accumulator value is an integer below
  * 2^53, so DuckDB's double-fold over the same lists (the shared
  * `cosSql` oracle fragment) produces bit-identical sums; the final
  * `dot / (sqrt(na)·sqrt(nb))` uses IEEE-correctly-rounded ops in a
  * fixed order. A zero-norm side yields 0.0 (quantized all-zero vector)
  * rather than NaN; length mismatch yields NULL, matching [[CosineSim]].
  */
case class Int8Cos(left: Expression, right: Expression)
  extends BinaryExpression {

  // Either side may be array<tinyint> (what a `transform(...).cast("byte")`
  // projection produces) or BINARY (the storage-optimal packed form — no
  // per-element overhead in parquet; also what an Array[Byte] literal
  // encodes to). The two are accepted independently so a freshly
  // quantized side can score against a packed stored side.
  private def accepted(t: DataType): Boolean = t match {
    case ArrayType(ByteType, _) => true
    case BinaryType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(e => accepted(e.dataType)))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<tinyint> or binary arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "int8_cos"

  private def toBytes(v: Any, t: DataType): Array[Byte] = t match {
    case BinaryType => v.asInstanceOf[Array[Byte]]
    case _ => v.asInstanceOf[ArrayData].toByteArray()
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = toBytes(a, left.dataType)
    val y = toBytes(b, right.dataType)
    val n = x.length
    if (y.length != n) return null
    var dot = 0L; var na = 0L; var nb = 0L
    var i = 0
    while (i < n) {
      val xi = x(i).toLong
      val yi = y(i).toLong
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    if (na == 0L || nb == 0L) 0.0
    else dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      def len(v: String, t: DataType) =
        if (t == BinaryType) s"$v.length" else s"$v.numElements()"
      def at(v: String, t: DataType, idx: String) =
        if (t == BinaryType) s"$v[$idx]" else s"$v.getByte($idx)"
      s"""
         |int $n = ${len(a, left.dataType)};
         |if (${len(b, right.dataType)} != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $dot = 0L; long $na = 0L; long $nb = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $xi = (long) ${at(a, left.dataType, i)};
         |    long $yi = (long) ${at(b, right.dataType, i)};
         |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |  }
         |  ${ev.value} = ($na == 0L || $nb == 0L) ? 0.0
         |    : ((double) $dot) / (java.lang.Math.sqrt((double) $na)
         |        * java.lang.Math.sqrt((double) $nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int8Cos =
    copy(left = newLeft, right = newRight)
}

object Int8Cos {
  /** Column wrapper: round to 6 dp like [[CosineSim]] for
    * cross-engine-stable comparison. */
  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.round(
      GraftBridge.column(Int8Cos(
        GraftBridge.expression(a), GraftBridge.expression(b))), 6)
}
