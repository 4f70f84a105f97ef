package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the distinct word n-gram shingles of a
  * document, each as its 60-bit md5 hash (first 15 hex chars of the md5,
  * base-16 — [[graft.ops.Dedup.hash60]]), in first-occurrence order.
  *
  * Replaces `hash60(explode(array_distinct(transform(sequence(...),
  * i => concat_ws(" ", slice(split(text, " "), i, n))))))` — the
  * interpreted-HOF shingle builder that dominated per-row CPU in the
  * n-gram and MinHash dedup scans (the same out-of-codegen pattern
  * [[CosineSim]] and [[FoldHash]] replaced for a measured ~20× win).
  * This compiles to one static call per row, and because the text was
  * split on single spaces, every shingle is a contiguous byte span of the
  * original document — the md5 runs over that span directly, with zero
  * per-shingle string allocation.
  *
  * Semantics match the HOF form and the DuckDB twin (string_split →
  * n-gram `array_to_string` → `list_distinct` → md5-hash) exactly:
  * consecutive spaces yield empty words, a document with fewer than `n`
  * words yields an empty array, distinctness is per shingle string.
  * (Dedup here keys on the 60-bit hash itself; it diverges from
  * string-distinct only when two distinct shingles of ONE document
  * collide in 60 bits, p ≈ s²/2⁶¹ per doc — far below any realistic
  * corpus noise floor.)
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(s"$prettyName requires n >= 1, got $n")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleHashUtil.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHashUtil.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashUtil {

  /** Distinct n-gram shingle hashes, first-occurrence order. */
  def shingles(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    // word boundaries: split on every single 0x20 (Spark `split(text," ")`
    // semantics — empty words between consecutive spaces are real words).
    // 0x20 never occurs inside a multi-byte UTF-8 sequence.
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
    if (nWords < n) return new GenericArrayData(Array.emptyLongArray)
    val md = MessageDigest.getInstance("MD5")
    val seen = new java.util.HashSet[java.lang.Long](nWords * 2)
    val out = new Array[Long](nWords - n + 1)
    var nOut = 0
    var w = 0
    while (w <= nWords - n) {
      // the shingle string is the byte span from word w through word w+n-1
      // (separators in the span are the single spaces concat_ws re-inserts)
      val from = starts(w)
      val len = ends(w + n - 1) - from
      md.reset()
      md.update(bytes, from, len)
      val d = md.digest()
      // first 15 hex chars = bytes 0..6 + high nibble of byte 7 (60 bits)
      var h = 0L
      var j = 0
      while (j < 7) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
      h = (h << 4) | ((d(7) & 0xf0L) >>> 4)
      if (seen.add(h)) { out(nOut) = h; nOut += 1 }
      w += 1
    }
    new GenericArrayData(if (nOut == out.length) out else java.util.Arrays.copyOf(out, nOut))
  }
}

object ShingleHashesFn {
  /** Column wrapper: distinct 60-bit shingle hashes of `text`. */
  def apply(text: Column, n: Int): Column =
    GraftBridge.column(ShingleHashes(GraftBridge.expression(text), n))
}
