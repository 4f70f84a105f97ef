package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Two-level (IMI-style) IVF assignment — the sublinear-in-cells form of
  * [[NearestCentroid]] for indexes whose cell count grows with the
  * corpus: the flat assignment scores every row against ALL cells
  * (∝ corpus × cells — the residual super-linear term in SCALING.md's
  * scaled-cells probe), while the two-level descent scores `branches`
  * TOP centroids, keeps the best `branchProbes` branches, and scores
  * only THOSE branches' fine centroids — ∝ branches +
  * branchProbes · cells/branches per row, minimized at branches ≈
  * √cells.
  *
  * The index structure is DERIVED deterministically from the flat fitted
  * centroid list (no second fit, so oracles unroll it from the same
  * centroid CTEs): tops = the `branches` lowest-cid centroids; every
  * fine centroid assigns to its nearest top under the EXACT flat
  * comparator (round-6dp cosine descending, sequence order on ties, NaN
  * above every number, dim-mismatch skipped) — see
  * [[graft.ops.Similarity.twoLevelIndex]].
  *
  * Semantics: with `branchProbes = branches` the descent scores every
  * fine centroid and equals [[NearestCentroid]] EXACTLY (pinned by
  * unit test); with fewer probed branches it is the standard IMI
  * approximation — a vector whose true cell hangs under an unprobed
  * branch lands in the best probed cell instead (recall measured in
  * RecallSweep, the classic knob). Null vector → null. If every fine
  * centroid mismatches the vector's dims, −1 (the flat rule). */
case class TwoLevelCell(child: Expression,
    tops: Seq[(Int, Array[Float])],
    fines: Seq[(Int, Int, Array[Float])],
    branchProbes: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _)
        if tops.nonEmpty && fines.nonEmpty &&
          branchProbes >= 1 && branchProbes <= tops.size =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires tops, fines and 1 <= branchProbes <= |tops|")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.sql}")
  }
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "two_level_cell"

  @transient private lazy val topMat: Array[Array[Float]] =
    tops.map(_._2).toArray
  @transient private lazy val fineCids: Array[Int] = fines.map(_._1).toArray
  @transient private lazy val fineBranch: Array[Int] = fines.map(_._2).toArray
  @transient private lazy val fineMat: Array[Array[Float]] =
    fines.map(_._3).toArray

  override def nullSafeEval(input: Any): Any =
    TwoLevelCentroidUtil.descend(input.asInstanceOf[ArrayData],
      topMat, fineCids, fineBranch, fineMat, branchProbes, 1).head

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tm = ctx.addReferenceObj("tlTops", topMat, "float[][]")
    val fc = ctx.addReferenceObj("tlFineCids", fineCids, "int[]")
    val fb = ctx.addReferenceObj("tlFineBranch", fineBranch, "int[]")
    val fm = ctx.addReferenceObj("tlFineMat", fineMat, "float[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TwoLevelCentroidUtil.descendOne($c, $tm, $fc, $fb, $fm, $branchProbes)")
  }

  override protected def withNewChildInternal(newChild: Expression): TwoLevelCell =
    copy(child = newChild)
}

/** [[TwoLevelCell]]'s top-n sibling — the query-side probe list
  * ([[NearestCentroids]]' two-level form): descend the `branchProbes`
  * best branches, rank THOSE branches' fine centroids by the flat
  * comparator, return the best `n` fine cids best-first. Fewer than `n`
  * reachable fine centroids return a shorter array. Null vector →
  * null. */
case class TwoLevelCells(child: Expression,
    tops: Seq[(Int, Array[Float])],
    fines: Seq[(Int, Int, Array[Float])],
    branchProbes: Int, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _)
        if tops.nonEmpty && fines.nonEmpty && n >= 1 &&
          branchProbes >= 1 && branchProbes <= tops.size =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires tops, fines, n >= 1 and 1 <= branchProbes <= |tops|")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "two_level_cells"

  @transient private lazy val topMat: Array[Array[Float]] =
    tops.map(_._2).toArray
  @transient private lazy val fineCids: Array[Int] = fines.map(_._1).toArray
  @transient private lazy val fineBranch: Array[Int] = fines.map(_._2).toArray
  @transient private lazy val fineMat: Array[Array[Float]] =
    fines.map(_._3).toArray

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      TwoLevelCentroidUtil.descend(input.asInstanceOf[ArrayData],
        topMat, fineCids, fineBranch, fineMat, branchProbes, n)
        .filter(_ != -1))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tm = ctx.addReferenceObj("tlTops", topMat, "float[][]")
    val fc = ctx.addReferenceObj("tlFineCids", fineCids, "int[]")
    val fb = ctx.addReferenceObj("tlFineBranch", fineBranch, "int[]")
    val fm = ctx.addReferenceObj("tlFineMat", fineMat, "float[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TwoLevelCentroidUtil.descendMany($c, $tm, $fc, $fb, $fm, $branchProbes, $n)")
  }

  override protected def withNewChildInternal(newChild: Expression): TwoLevelCells =
    copy(child = newChild)
}

object TwoLevelCentroidUtil {

  import NearestCentroidUtil.round6

  /** Spark `greatest` ordering on doubles: NaN above every number —
    * [[NearestCentroidUtil]]'s rule, repeated here because it is
    * private there and the comparator MUST be shared verbatim. */
  private def gt(a: Double, b: Double): Boolean =
    if (java.lang.Double.isNaN(a)) !java.lang.Double.isNaN(b)
    else !java.lang.Double.isNaN(b) && a > b

  private def cos6(v: ArrayData, m: Array[Float]): Double = {
    val n = v.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = v.getFloat(i).toDouble
      val yi = m(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    round6(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  /** The two-level descent: best `branchProbes` top indexes (flat
    * comparator, sequence ties), then top-`n` fine cids among the
    * probed branches' fines. Returns an int array of length `n`
    * right-padded with −1 when fewer fines are reachable (callers
    * strip; descendOne takes element 0 — −1 is the flat
    * every-centroid-mismatched rule). */
  def descend(v: ArrayData, topMat: Array[Array[Float]],
      fineCids: Array[Int], fineBranch: Array[Int],
      fineMat: Array[Array[Float]], branchProbes: Int, n: Int): Array[Int] = {
    val dim = v.numElements()
    // stage 1: score tops (dim-mismatched tops sink below all — they
    // cannot be probed; a branch whose TOP mismatches is unreachable,
    // matching the flat rule where its fines would still be scored —
    // so tops and fines must share dims, which twoLevelIndex guarantees
    // by construction: tops ARE centroids)
    val tCos = new Array[Double](topMat.length)
    val tOk = new Array[Boolean](topMat.length)
    var i = 0
    while (i < topMat.length) {
      if (topMat(i).length == dim) { tCos(i) = cos6(v, topMat(i)); tOk(i) = true }
      i += 1
    }
    val probed = new Array[Boolean](topMat.length)
    var r = 0
    var more = true
    while (r < branchProbes && more) {
      var best = -1
      var j = 0
      while (j < topMat.length) {
        if (tOk(j) && !probed(j) && (best == -1 || gt(tCos(j), tCos(best))))
          best = j
        j += 1
      }
      if (best == -1) more = false
      else { probed(best) = true; r += 1 }
    }
    // stage 2: rank the probed branches' fines, flat comparator
    val fCos = new Array[Double](fineCids.length)
    val fOk = new Array[Boolean](fineCids.length)
    var c = 0
    while (c < fineCids.length) {
      if (probed(fineBranch(c)) && fineMat(c).length == dim) {
        fCos(c) = cos6(v, fineMat(c)); fOk(c) = true
      }
      c += 1
    }
    val taken = new Array[Boolean](fineCids.length)
    val out = Array.fill(n)(-1)
    var k = 0
    var go = true
    while (k < n && go) {
      var best = -1
      var c2 = 0
      while (c2 < fineCids.length) {
        if (fOk(c2) && !taken(c2) && (best == -1 || gt(fCos(c2), fCos(best))))
          best = c2
        c2 += 1
      }
      if (best == -1) go = false
      else {
        // replicated indexes register a fine under several branches
        // (same cid, same vector, same cosine): mark EVERY entry of the
        // chosen cid taken so the probe list never repeats a cell
        val cid = fineCids(best)
        var c3 = 0
        while (c3 < fineCids.length) {
          if (fineCids(c3) == cid) taken(c3) = true
          c3 += 1
        }
        out(k) = cid; k += 1
      }
    }
    out
  }

  def descendOne(v: ArrayData, topMat: Array[Array[Float]],
      fineCids: Array[Int], fineBranch: Array[Int],
      fineMat: Array[Array[Float]], branchProbes: Int): Int =
    descend(v, topMat, fineCids, fineBranch, fineMat, branchProbes, 1).head

  def descendMany(v: ArrayData, topMat: Array[Array[Float]],
      fineCids: Array[Int], fineBranch: Array[Int],
      fineMat: Array[Array[Float]], branchProbes: Int, n: Int): ArrayData =
    new GenericArrayData(
      descend(v, topMat, fineCids, fineBranch, fineMat, branchProbes, n)
        .filter(_ != -1))

  /** Driver-side flat assignment over a plain float array — the SAME
    * comparator as [[NearestCentroidUtil.assign]], for building the
    * fine→branch table of [[graft.ops.Similarity.twoLevelIndex]] (the
    * model is driver-side; no ArrayData exists there). */
  def assignF(v: Array[Float], cids: Array[Int],
      mat: Array[Array[Float]]): Int = {
    var has = false
    var best = 0.0
    var bestCid = -1
    var c = 0
    while (c < mat.length) {
      val m = mat(c)
      if (m.length == v.length) {
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        while (i < v.length) {
          val xi = v(i).toDouble
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

  /** [[assignF]]'s top-n form: the `n` best branch INDEXES for a plain
    * float vector under the same comparator (cosine desc, sequence
    * ties) — for replicated fine registration
    * ([[graft.ops.Similarity.twoLevelIndexFitted]]'s `replicas`).
    * Shorter when fewer than `n` tops share the vector's dims. */
  def assignTopNF(v: Array[Float], mat: Array[Array[Float]],
      n: Int): Array[Int] = {
    val cos = new Array[Double](mat.length)
    val ok = new Array[Boolean](mat.length)
    var c = 0
    while (c < mat.length) {
      val m = mat(c)
      if (m.length == v.length) {
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        while (i < v.length) {
          val xi = v(i).toDouble
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
        if (ok(c2) && !taken(c2) && (best == -1 || gt(cos(c2), cos(best))))
          best = c2
        c2 += 1
      }
      if (best == -1) more = false
      else { taken(best) = true; out += best; r += 1 }
    }
    out.toArray
  }
}

object TwoLevelCellFn {
  def apply(vec: Column, tops: Seq[(Int, Array[Float])],
      fines: Seq[(Int, Int, Array[Float])], branchProbes: Int): Column =
    GraftBridge.column(
      TwoLevelCell(GraftBridge.expression(vec), tops, fines, branchProbes))
}

object TwoLevelCellsFn {
  def apply(vec: Column, tops: Seq[(Int, Array[Float])],
      fines: Seq[(Int, Int, Array[Float])], branchProbes: Int,
      n: Int): Column =
    GraftBridge.column(
      TwoLevelCells(GraftBridge.expression(vec), tops, fines, branchProbes, n))
}
