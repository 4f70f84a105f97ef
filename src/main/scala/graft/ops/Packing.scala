package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sequence packing for LLM pretraining data: documents are concatenated
  * in a deterministic order and cut into fixed token-budget blocks; a
  * document belongs to the block its START offset falls in (the
  * concat-and-cut semantics of pretraining data loaders — a doc may span
  * into the next block; true no-split bin packing is NP-hard and
  * pipelines don't use it).
  *
  * Scale shape: one window cumulative sum per partition group (one
  * shuffle on `partCols`, linear scan within). Pack within natural
  * shards (language, source, date) so no single group serializes the
  * corpus — the same reason pretraining shards are packed per file. */
object Packing {

  /** Assign each row its pack/sequence id: `floor(startOffset / budget)`
    * where startOffset is the exclusive running sum of `tokenCol` over
    * `orderCols` within `partCols`. Output: input columns + `seq_id`.
    * The order must be total (include a unique id) or assignment is
    * nondeterministic under ties. */
  def packSequences(df: DataFrame, partCols: Seq[String],
      orderCols: Seq[String], tokenCol: Column, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("seq_id",
      floor((sum(tokenCol).over(w) - tokenCol) / budget).cast("long"))
  }
}
