package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{ArgExtremum, CooccurPairs, CosineSim, FoldHash, Int8Cos, MinHashSig, ShingleHashes, SimHash, WinnowHashes}

/** Spark-native extension point: registers graft's custom Catalyst
  * expressions as SQL functions, so `spark.sql("SELECT cosine_sim(a, b)")`
  * works next to the Column API. Install with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`.
  *
  * Registered: `cosine_sim(a, b)`, `int8_cos(qa, qb)`, `fold_hash(text)`,
  * `shingle_hashes(text, n)`, `simhash(text, bits)`,
  * `minhash_sig(hashes, k)`, `winnow_hashes(text, k, w)`,
  * `cooccur_pairs(text, window)` — the size parameters must be integer
  * literals (they shape the generated code, like `round`'s scale) —
  * plus the hash-aggregable argmax pair `arg_max_hash(value, ord)` /
  * `arg_min_hash(value, ord)` (max_by/min_by semantics without the
  * SortAggregate fallback on var-length types). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, fn: String): Int =
    if (e.foldable) e.eval() match {
      case n: Number => n.intValue()
      case other => sys.error(s"$fn: expected an integer literal, got $other")
    } else sys.error(s"$fn: size parameter must be a literal")

  private def fn(name: String, arity: Int, build: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) = (
    FunctionIdentifier(name),
    new ExpressionInfo(classOf[CosineSim].getName, name),
    (args: Seq[Expression]) => {
      require(args.length == arity, s"$name takes exactly $arity arguments")
      build(args)
    })

  /** All registered functions; exposed so tests (and sessions built
    * before the extension was installed) can register the same set. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder)] = Seq(
    fn("cosine_sim", 2, a => CosineSim(a(0), a(1))),
    fn("int8_cos", 2, a => Int8Cos(a(0), a(1))),
    fn("fold_hash", 1, a => FoldHash(a(0))),
    fn("shingle_hashes", 2, a => ShingleHashes(a(0), intLit(a(1), "shingle_hashes"))),
    fn("simhash", 2, a => SimHash(a(0), intLit(a(1), "simhash"))),
    fn("minhash_sig", 2, a => MinHashSig(a(0), intLit(a(1), "minhash_sig"))),
    fn("winnow_hashes", 3, a => WinnowHashes(a(0),
      intLit(a(1), "winnow_hashes"), intLit(a(2), "winnow_hashes"))),
    fn("cooccur_pairs", 2, a => CooccurPairs(a(0), intLit(a(1), "cooccur_pairs"))),
    fn("arg_max_hash", 2,
      a => ArgExtremum(a(0), a(1), asMin = false).toAggregateExpression()),
    fn("arg_min_hash", 2,
      a => ArgExtremum(a(0), a(1), asMin = true).toAggregateExpression()))

  override def apply(ext: SparkSessionExtensions): Unit =
    functions.foreach(ext.injectFunction)
}
