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

/** [[NearestCentroid]]'s top-n sibling: the `n` nearest centroid ids by
  * the SAME comparator (round-6dp cosine descending, sequence order
  * breaking ties, NaN above every number — so an all-NaN zero vector
  * returns the first `n` centroids in sequence order), as one generated
  * static call returning `array<int>` — the query-side IVF probe list
  * ([[graft.ops.Similarity.knnJoinIvf]]) without the corpus-sized
  * row_number window an argmax-by-join would need. Centroids whose
  * dimension count mismatches the row's vector are skipped (the chain's
  * NULL-cosine rule); fewer than `n` valid centroids return a shorter
  * array (empty when all mismatch). Callers pass centroids sorted by
  * cid ascending (every call site's convention) so sequence-order ties
  * equal the oracle's `ORDER BY cc DESC, cid ASC`. Null vector → null. */
case class NearestCentroids(child: Expression,
    centroids: Seq[(Int, Array[Float])], n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if centroids.nonEmpty && n >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires >= 1 centroid and n >= 1")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_centroids"

  @transient private lazy val cids: Array[Int] = centroids.map(_._1).toArray
  @transient private lazy val mat: Array[Array[Float]] =
    centroids.map(_._2).toArray

  override def nullSafeEval(input: Any): Any =
    NearestCentroidUtil.assignTopN(input.asInstanceOf[ArrayData], cids, mat, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cidsRef = ctx.addReferenceObj("nvCids", cids, "int[]")
    val matRef = ctx.addReferenceObj("nvMat", mat, "float[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NearestCentroidUtil.assignTopN($c, $cidsRef, $matRef, $n)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
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

  /** Top-n selection under [[assign]]'s exact comparator: cosine
    * descending ([[gt]]: NaN above every number), sequence order on
    * ties — a k-sized insertion pass (k = |centroids| is single digits;
    * no sort, no allocation beyond the result). */
  def assignTopN(v: ArrayData, cids: Array[Int], mat: Array[Array[Float]],
      n: Int): ArrayData = {
    val dim = v.numElements()
    val cos = new Array[Double](mat.length)
    val ok = new Array[Boolean](mat.length)
    var c = 0
    while (c < mat.length) {
      val m = mat(c)
      if (m.length == dim) {
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        while (i < dim) {
          val xi = v.getFloat(i).toDouble
          val yi = m(i).toDouble
          dot += xi * yi; na += xi * xi; nb += yi * yi
          i += 1
        }
        cos(c) = round6(dot / (math.sqrt(na) * math.sqrt(nb)))
        ok(c) = true
      }
      c += 1
    }
    val taken = new Array[Boolean](mat.length)
    val out = new scala.collection.mutable.ArrayBuffer[Int](n)
    var r = 0
    var more = true
    while (r < n && more) {
      var best = -1
      var c2 = 0
      while (c2 < mat.length) {
        // strict gt ⇒ among equals the EARLIEST untaken index wins —
        // the same tie rule as assign()
        if (ok(c2) && !taken(c2) &&
            (best == -1 || gt(cos(c2), cos(best)))) best = c2
        c2 += 1
      }
      if (best == -1) more = false
      else { taken(best) = true; out += cids(best); r += 1 }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}

object NearestCentroidFn {
  def apply(vec: Column, centroids: Seq[(Int, Array[Float])]): Column =
    GraftBridge.column(NearestCentroid(GraftBridge.expression(vec), centroids))
}

object NearestCentroidsFn {
  def apply(vec: Column, centroids: Seq[(Int, Array[Float])], n: Int): Column =
    GraftBridge.column(
      NearestCentroids(GraftBridge.expression(vec), centroids, n))
}
