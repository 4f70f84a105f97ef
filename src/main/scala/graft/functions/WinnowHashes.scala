package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: a document's WINNOWED fingerprints —
  * the distinct 60-bit md5 hashes ([[graft.ops.Dedup.hash60]]
  * construction) of its word k-grams that are minimal in at least one
  * sliding window of `w` consecutive k-gram positions (Schleimer,
  * Wilkerson & Aiken, "Winnowing: Local Algorithms for Document
  * Fingerprinting", SIGMOD 2003). Winnowing's guarantee: any shared
  * substring of at least k + w − 1 words between two documents yields
  * at least one SHARED selected fingerprint, while only ~2/(w+1) of
  * the grams are kept — position-robust overlap detection (plagiarism
  * / contamination style) at a w-fold storage discount over full
  * shingling. Deviation from the paper, documented: fingerprints are
  * the distinct hash VALUES (positions dropped, no rightmost-in-window
  * tiebreak) — the overlap measure downstream joins on values only,
  * and a value set is what an external SQL engine mirrors exactly.
  *
  * Edge semantics (mirrored by the DuckDB twin): fewer than k words →
  * empty array; between 1 and w k-grams → one window spanning them all
  * (every non-trivial document keeps ≥ 1 fingerprint). Word split is
  * on every single 0x20 ([[ShingleHashes]] semantics — consecutive
  * spaces yield empty words); the k-gram hash runs over the original
  * contiguous byte span, zero per-gram allocation. Unlike
  * [[ShingleHashes]] the gram sequence here is positional (NOT
  * distinct) — repeated grams re-enter every window they fall in, as
  * the winnowing definition requires. Window minima advance with a
  * monotone deque in O(grams) total, not O(grams × w). */
case class WinnowHashes(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k >= 1 && w >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires k >= 1 and w >= 1, got ($k, $w)")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_hashes"

  override def nullSafeEval(input: Any): Any =
    WinnowHashUtil.winnow(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowHashUtil.winnow($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowHashes =
    copy(child = newChild)
}

object WinnowHashUtil {

  /** Distinct window-min k-gram hashes, first-selection order. */
  def winnow(s: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = s.getBytes
    var nWords = 0
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == 0x20) {
        if (nWords == starts.length) {
          starts = java.util.Arrays.copyOf(starts, nWords * 2)
          ends = java.util.Arrays.copyOf(ends, nWords * 2)
        }
        starts(nWords) = start
        ends(nWords) = i
        nWords += 1
        start = i + 1
      }
      i += 1
    }
    if (nWords < k) return new GenericArrayData(Array.emptyLongArray)
    val nGrams = nWords - k + 1
    val md = MessageDigest.getInstance("MD5")
    val grams = new Array[Long](nGrams)
    var g = 0
    while (g < nGrams) {
      val from = starts(g)
      val len = ends(g + k - 1) - from
      md.reset()
      md.update(bytes, from, len)
      val d = md.digest()
      var h = 0L
      var j = 0
      while (j < 7) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
      grams(g) = (h << 4) | ((d(7) & 0xf0L) >>> 4)
      g += 1
    }
    val seen = new java.util.HashSet[java.lang.Long](nGrams * 2)
    val out = new Array[Long](nGrams)
    var nOut = 0
    if (nGrams <= w) {
      // one window over everything: min of all grams
      var m = grams(0)
      var x = 1
      while (x < nGrams) { if (grams(x) < m) m = grams(x); x += 1 }
      out(0) = m; nOut = 1
    } else {
      // monotone (increasing) deque of gram indices: head = window min
      val dq = new Array[Int](nGrams)
      var head = 0
      var tail = 0 // exclusive
      var x = 0
      while (x < nGrams) {
        while (tail > head && grams(dq(tail - 1)) >= grams(x)) tail -= 1
        dq(tail) = x; tail += 1
        if (dq(head) <= x - w) head += 1
        if (x >= w - 1 && seen.add(grams(dq(head)))) {
          out(nOut) = grams(dq(head)); nOut += 1
        }
        x += 1
      }
    }
    new GenericArrayData(if (nOut == out.length) out
      else java.util.Arrays.copyOf(out, nOut))
  }
}

object WinnowHashesFn {
  /** Column wrapper: distinct winnowed fingerprint hashes of `text`. */
  def apply(text: Column, k: Int, w: Int): Column =
    GraftBridge.column(WinnowHashes(GraftBridge.expression(text), k, w))
}
