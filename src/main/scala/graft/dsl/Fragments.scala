package graft.dsl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Reusable topology fragments — the reference's `workflow.clj` pattern:
  * pre-built (edges, entities) pieces spliced into a larger topology. */
object Fragments {

  import Records._

  /** Exactly-once-by-id dedupe fragment (willa `workflow.clj:6-24`): only
    * the first record per `idExpr` identity flows through, ordered by
    * (ts, key) — ties beyond that are broken by the value's lexicographic
    * order, making batch replays deterministic where the reference relied
    * on stream arrival order.
    *
    * Splice between `inId` and `outId`:
    * {{{
    * val (edges, ents) = Fragments.dedupe("events", "clean", col("value.event_id"))
    * Topology(baseEdges ++ edges, baseEntities ++ ents)
    * }}}
    */
  def dedupe(inId: String, outId: String, idExpr: Column): (Seq[(String, String)], Map[String, Entity]) = {
    val nodeId = s"__dedupe_${inId}_$outId"
    val entity = Entity.KStream(Some(Xform.Custom { df =>
      if (df.isStreaming)
        // streaming: keyed first-arrival state (exactly the reference's
        // live semantics — Kafka Streams also dedupes in ARRIVAL order,
        // willa workflow.clj:6-24; batch replays get the ts total order)
        df.withColumn("__did", idExpr)
          .dropDuplicates("__did")
          .select(col(KeyCol), col(ValueCol), col(TsCol))
      else
        Dedup.keepFirst(
          df.withColumn("__did", idExpr),
          Seq("__did"), Seq(TsCol, KeyCol, ValueCol))
          .select(col(KeyCol), col(ValueCol), col(TsCol))
    }))
    (Seq(inId -> nodeId, nodeId -> outId), Map(nodeId -> entity))
  }
}
