package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.CosineSim

/** Spark-native extension point: registers graft's custom Catalyst
  * expressions as SQL functions, so `spark.sql("SELECT cosine_sim(a, b)")`
  * works next to the Column API. Install with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_sim takes exactly 2 arguments")
        CosineSim(args(0), args(1))
      }): (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))
  }
}
