package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native Catalyst expression: id of the nearest centroid by round-6dp
  * cosine — the IVF/k-means assignment step as ONE generated static
  * call per row.
  *
  * Why not the Column form (k [[CosineSim]] expressions → `greatest` →
  * a `when`-chain): that tree is correct but big — k cosines each
  * referenced twice plus a k-deep conditional — and at k = 8 its
  * whole-stage-generated code trips a janino compile error ("expression
  * is not an rvalue", observed on q98), silently dropping the WHOLE
  * stage to interpreted execution: the exact regression class the plan
  * gate exists for, except codegen fallback doesn't show in the plan.
  * One small expression with the centroid matrix as a codegen reference
  * object keeps the stage compiled (the [[JlProjectInt8]] pattern).
  *
  * Semantics are IDENTICAL to the chain (oracle-hash-verified):
  * per-centroid cosine in double, HALF_UP-rounded to 6 dp via the same
  * exact-binary BigDecimal Spark's codegen `round` applies; the FIRST
  * centroid (in the given sequence order) attaining the maximum wins
  * ties — `greatest` treats NaN as greater than any number and the
  * chain's `===` matches it, so an all-NaN row (zero vector) resolves
  * to the first centroid here too; a centroid whose dimension count
  * differs from the row's vector has a NULL cosine in the chain and is
  * skipped here; if EVERY centroid mismatches, the chain's `otherwise`
  * literal −1 is returned. Null vector → null (nullIntolerant). */
case class NearestCentroid(child: Expression,
    centroids: Seq[(Int, Array[Float])]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if centroids.nonEmpty =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires at least one centroid")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.sql}")
  }
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_centroid"

  @transient private lazy val cids: Array[Int] = centroids.map(_._1).toArray
  @transient private lazy val mat: Array[Array[Float]] =
    centroids.map(_._2).toArray

  override def nullSafeEval(input: Any): Any =
    NearestCentroidUtil.assign(input.asInstanceOf[ArrayData], cids, mat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cidsRef = ctx.addReferenceObj("nvCids", cids, "int[]")
    val matRef = ctx.addReferenceObj("nvMat", mat, "float[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NearestCentroidUtil.assign($c, $cidsRef, $matRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroidUtil {

  /** Spark codegen `round(x, 6)` parity: exact-binary BigDecimal,
    * HALF_UP. NaN/∞ pass through (BigDecimal would throw). */
  def round6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else new java.math.BigDecimal(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Spark `greatest` ordering on doubles: NaN above every number. */
  private def gt(a: Double, b: Double): Boolean =
    if (java.lang.Double.isNaN(a)) !java.lang.Double.isNaN(b)
    else !java.lang.Double.isNaN(b) && a > b

  def assign(v: ArrayData, cids: Array[Int], mat: Array[Array[Float]]): Int = {
    val n = v.numElements()
    var has = false
    var best = 0.0
    var bestCid = -1
    var c = 0
    while (c < mat.length) {
      val m = mat(c)
      if (m.length == n) { // dim mismatch = NULL cosine in the chain: skip
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        while (i < n) {
          val xi = v.getFloat(i).toDouble
          val yi = m(i).toDouble
          dot += xi * yi; na += xi * xi; nb += yi * yi
          i += 1
        }
        val cos = round6(dot / (math.sqrt(na) * math.sqrt(nb)))
        if (!has || gt(cos, best)) { has = true; best = cos; bestCid = cids(c) }
      }
      c += 1
    }
    bestCid
  }
}

object NearestCentroidFn {
  def apply(vec: Column, centroids: Seq[(Int, Array[Float])]): Column =
    GraftBridge.column(NearestCentroid(GraftBridge.expression(vec), centroids))
}
