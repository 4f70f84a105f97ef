package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: a document's token-distribution facts —
  * `[n_tokens, n_types, entropy_micro]` — computed in ONE pass over the
  * row, replacing the explode → count-per-(doc, token) → re-aggregate
  * plan whose exchange carries the entire token stream (at 100 TB the
  * corpus's every token would cross the shuffle twice; here nothing
  * shuffles at all — the whole computation is a narrow projection).
  *
  * Unigram Shannon entropy is a standard per-document quality/diversity
  * signal (low entropy ⇔ repetitive boilerplate; cf. the repetition
  * filters of Rae et al. 2021, "Scaling Language Models: ... Gopher").
  * The value is the house integer trick ([[graft.ops.Stats.groupCard]]):
  * each token type's −p·ln p term is rounded to exact MICRO-NAT longs
  * before summing, so the per-doc total is order-free and bit-identical
  * to a SQL engine grouping the exploded tokens.
  *
  * Token split mirrors DuckDB's `string_split(text, ' ')` exactly: every
  * single 0x20 is a boundary, consecutive/leading/trailing spaces yield
  * EMPTY tokens (which count as a type), and the empty string is one
  * empty token — the q95 oracle convention, so oracles agree on N. */
case class TokenEntropy(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_entropy"

  override def nullSafeEval(input: Any): Any =
    TokenEntropyUtil.facts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenEntropyUtil.facts($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenEntropy =
    copy(child = newChild)
}

object TokenEntropyUtil {

  /** `[n_tokens, n_types, entropy_micro]` for one document. */
  def facts(s: UTF8String): ArrayData = {
    val counts = new java.util.HashMap[String, Array[Long]]()
    var n = 0L
    // String.split(" ", -1) == DuckDB string_split(text, ' '): keeps
    // empty tokens, one empty token for the empty string
    val toks = s.toString.split(" ", -1)
    var i = 0
    while (i < toks.length) {
      val c = counts.get(toks(i))
      if (c == null) counts.put(toks(i), Array(1L)) else c(0) += 1L
      n += 1L
      i += 1
    }
    var micro = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next()(0).toDouble / n.toDouble
      micro += Math.round(-p * Math.log(p) * 1e6)
    }
    new GenericArrayData(Array(n, counts.size.toLong, micro))
  }
}

object TokenEntropyFn {
  /** Column wrapper: `[n_tokens, n_types, entropy_micro]` of `text`. */
  def apply(text: Column): Column =
    GraftBridge.column(TokenEntropy(GraftBridge.expression(text)))
}
