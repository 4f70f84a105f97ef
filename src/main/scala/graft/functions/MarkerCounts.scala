package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Marker-substring counting for language ID / quality scoring, as native
  * codegen expressions.
  *
  * The Column form (`(length(t) - length(replace(t, m, ''))) / len(m)`
  * per marker) allocates a full copy of the document per marker — 23
  * markers × (replace + 2 × length) = dozens of whole-document passes and
  * string allocations per row; q30 was the slowest text query in every
  * driver run. These expressions make ONE padded copy per row and count
  * every marker with allocation-free `indexOf` scans, inside whole-stage
  * codegen.
  *
  * Count semantics are exactly the replace-trick's: non-overlapping
  * occurrences scanned left-to-right (each match consumes its characters).
  * The DuckDB oracle keeps the replace form — outputs are identical.
  */
object MarkerOps {

  private val Space = UTF8String.fromString(" ")

  /** Non-overlapping occurrences of `m` in `s`, scanning left-to-right.
    * An empty marker counts 0 (indexOf("") returns its start position, so
    * without the guard the scan position never advances). */
  def countIn(s: UTF8String, m: UTF8String): Long = {
    val mlen = m.numChars()
    if (mlen == 0) return 0L
    var cnt = 0L
    var pos = 0
    var i = s.indexOf(m, pos)
    while (i >= 0) {
      cnt += 1
      pos = i + mlen
      i = s.indexOf(m, pos)
    }
    cnt
  }

  /** Sum of marker counts over ' '||text||' '. */
  def countSum(text: UTF8String, markers: Array[UTF8String]): Long = {
    val padded = UTF8String.concat(Space, text, Space)
    var total = 0L
    var k = 0
    while (k < markers.length) {
      total += countIn(padded, markers(k))
      k += 1
    }
    total
  }

  /** Argmax language over per-language marker-count sums: earlier language
    * wins ties, "und" when every score is 0. One padded copy, one counting
    * scan per marker, no intermediate columns. */
  def langId(text: UTF8String, markerSets: Array[Array[UTF8String]],
      names: Array[UTF8String], und: UTF8String): UTF8String = {
    val padded = UTF8String.concat(Space, text, Space)
    var bestScore = 0L
    var bestIdx = -1
    var k = 0
    while (k < markerSets.length) {
      val ms = markerSets(k)
      var score = 0L
      var j = 0
      while (j < ms.length) {
        score += countIn(padded, ms(j))
        j += 1
      }
      if (score > bestScore) { bestScore = score; bestIdx = k }
      k += 1
    }
    if (bestIdx < 0) und else names(bestIdx)
  }
}

/** `SUM over markers of count(marker in ' '||text||' ')` — the stopword
  * score of [[graft.ops.TextAnalysis.langScore]] in one codegen call. */
case class MarkerCountSum(child: Expression, markers: Seq[String])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "marker_count_sum"

  @transient private lazy val markerArr: Array[UTF8String] =
    markers.map(UTF8String.fromString).toArray

  override def nullSafeEval(input: Any): Any =
    MarkerOps.countSum(input.asInstanceOf[UTF8String], markerArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("markers", markerArr,
      "org.apache.spark.unsafe.types.UTF8String[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.MarkerOps.countSum($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): MarkerCountSum =
    copy(child = newChild)
}

/** Heuristic language ID ([[graft.ops.TextAnalysis.langId]] semantics) in
  * one codegen call per row. */
case class LangIdExpr(child: Expression, langs: Seq[(String, Seq[String])])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.sql}")
  }
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lang_id"

  @transient private lazy val markerSets: Array[Array[UTF8String]] =
    langs.map(_._2.map(UTF8String.fromString).toArray).toArray
  @transient private lazy val names: Array[UTF8String] =
    langs.map(l => UTF8String.fromString(l._1)).toArray
  @transient private lazy val und: UTF8String = UTF8String.fromString("und")

  override def nullSafeEval(input: Any): Any =
    MarkerOps.langId(input.asInstanceOf[UTF8String], markerSets, names, und)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setsRef = ctx.addReferenceObj("markerSets", markerSets,
      "org.apache.spark.unsafe.types.UTF8String[][]")
    val namesRef = ctx.addReferenceObj("langNames", names,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val undRef = ctx.addReferenceObj("und", und,
      "org.apache.spark.unsafe.types.UTF8String")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MarkerOps.langId($c, $setsRef, $namesRef, $undRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}
