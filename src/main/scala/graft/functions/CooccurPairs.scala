package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: a document's windowed co-occurrence
  * pairs — for tokens at (filtered, 1-based) positions i < j ≤ i +
  * `window`, the UNORDERED pair as the single string `"min max"`
  * (binary byte order, Spark's string comparison), one element per
  * occurrence (NOT distinct — the consumer counts them).
  *
  * Replaces the interpreted nested-HOF form
  * `flatten(transform(ws, (x,i) => transform(slice(ws, i+2, w), y =>
  * concat_ws(" ", least(x,y), greatest(x,y))))` in
  * [[graft.ops.TextAnalysis.cooccurTopK]] — the same out-of-codegen
  * pattern [[ShingleHashes]] replaced for a measured ~20× per-row win.
  * One static call per row; empty words (consecutive spaces) are
  * dropped BEFORE pairing, exactly like the HOF form's
  * `filter(split(text, " "), x => x != "")`, so pair distance is over
  * surviving token positions. */
case class CooccurPairs(child: Expression, window: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if window >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires window >= 1, got $window")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cooccur_pairs"

  override def nullSafeEval(input: Any): Any =
    CooccurPairUtil.pairs(input.asInstanceOf[UTF8String], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CooccurPairUtil.pairs($c, $window)")

  override protected def withNewChildInternal(newChild: Expression): CooccurPairs =
    copy(child = newChild)
}

object CooccurPairUtil {

  /** All windowed unordered pair strings, occurrence order. */
  def pairs(s: UTF8String, window: Int): ArrayData = {
    val bytes = s.getBytes
    // non-empty word spans (split on single 0x20, empties dropped)
    var nWords = 0
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == 0x20) {
        if (i > start) {
          if (nWords == starts.length) {
            starts = java.util.Arrays.copyOf(starts, nWords * 2)
            ends = java.util.Arrays.copyOf(ends, nWords * 2)
          }
          starts(nWords) = start
          ends(nWords) = i
          nWords += 1
        }
        start = i + 1
      }
      i += 1
    }
    if (nWords < 2) return new GenericArrayData(Array.empty[AnyRef])
    // unsigned byte-lexicographic compare of word spans — UTF8String /
    // DuckDB binary-collation order
    def lt(a: Int, b: Int): Boolean = {
      val la = ends(a) - starts(a)
      val lb = ends(b) - starts(b)
      val n = math.min(la, lb)
      var k = 0
      while (k < n) {
        val ca = bytes(starts(a) + k) & 0xff
        val cb = bytes(starts(b) + k) & 0xff
        if (ca != cb) return ca < cb
        k += 1
      }
      la < lb
    }
    val nPairs = {
      var c = 0L
      var w = 0
      while (w < nWords - 1) {
        c += math.min(window, nWords - 1 - w); w += 1
      }
      c.toInt
    }
    val out = new Array[AnyRef](nPairs)
    var o = 0
    var a = 0
    while (a < nWords - 1) {
      var b = a + 1
      val hi = math.min(a + window, nWords - 1)
      while (b <= hi) {
        val (x, y) = if (lt(b, a)) (b, a) else (a, b)
        val lx = ends(x) - starts(x)
        val ly = ends(y) - starts(y)
        val pair = new Array[Byte](lx + 1 + ly)
        System.arraycopy(bytes, starts(x), pair, 0, lx)
        pair(lx) = 0x20
        System.arraycopy(bytes, starts(y), pair, lx + 1, ly)
        out(o) = UTF8String.fromBytes(pair)
        o += 1
        b += 1
      }
      a += 1
    }
    new GenericArrayData(out)
  }
}

object CooccurPairsFn {
  /** Column wrapper: windowed unordered co-occurrence pair strings. */
  def apply(text: Column, window: Int): Column =
    GraftBridge.column(CooccurPairs(GraftBridge.expression(text), window))
}
