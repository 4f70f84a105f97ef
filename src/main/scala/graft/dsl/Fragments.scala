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
  def dedupe(inId: String, outId: String, idExpr: Column): (Seq[(String, String)], Map[String, Entity]) =
    // streaming: keyed first-arrival state (exactly the reference's
    // live semantics — Kafka Streams also dedupes in ARRIVAL order,
    // willa workflow.clj:6-24; batch replays get the ts total order)
    dedupeNode(s"__dedupe_${inId}_$outId", inId, outId, idExpr,
      _.dropDuplicates("__did"))

  /** Bounded-horizon dedupe fragment — the 100 TB variant of [[dedupe]]:
    * dedup state EXPIRES with the watermark instead of growing with
    * distinct-ids-ever-seen. The streaming lowering is Spark's built-in
    * `dropDuplicatesWithinWatermark` (no custom state op needed):
    * duplicates arriving within the watermark delay of the first
    * occurrence are guaranteed dropped, and each id's state is cleaned
    * once the watermark passes its event time PLUS the delay — a
    * duplicate arriving farther apart than the horizon may flow again
    * (between one and two delay-widths out, whether it dedups depends
    * on how far the watermark has advanced; past state expiry it always
    * flows). That is the trade that
    * bounds state, and it is exactly Kafka Streams' windowed-store
    * dedup trade. Requires the topology to run with a watermark
    * (`StreamCompiler.run(watermarkMs = ...)`) — Spark fails the query
    * at start otherwise (deliberate: an unbounded horizon is what
    * [[dedupe]] is for). The watermark DELAY is the horizon: an id's
    * state lives until the watermark passes its event time + delay, so
    * `watermarkMs = 0` expires every id at the next batch and dedups
    * nothing across batches — size the delay to the duplicate spread.
    *
    * Batch lowering is identical to [[dedupe]] (a batch replay holds the
    * whole horizon at once), so batch == streaming on WHICH ids survive
    * exactly when all duplicates fall within the horizon — but, as with
    * [[dedupe]], the surviving PAYLOAD can differ: streaming keeps the
    * first ARRIVAL per id while the batch twin keeps the
    * (ts, key, value)-minimal record, so an out-of-order duplicate
    * arriving first inside the horizon survives in streaming where batch
    * keeps the earlier-ts one. The two agree row-for-row only when
    * duplicates arrive in ts order or carry identical payloads — the
    * in-order direction is property-tested for both fragments
    * (`StreamCongruitySpec` "IN-ORDER feeds ... PAYLOAD-for-payload"). */
  def dedupeWithin(inId: String, outId: String, idExpr: Column): (Seq[(String, String)], Map[String, Entity]) =
    dedupeNode(s"__dedupew_${inId}_$outId", inId, outId, idExpr,
      _.dropDuplicatesWithinWatermark("__did"))

  /** Shared shape of the two dedupe fragments: only the streaming dedup
    * operator differs; the batch arm (keepFirst with the
    * (ts, key, value) determinism ordering), the record-shape select,
    * and the splice wiring stay identical — ONE definition so the two
    * fragments' batch twins cannot drift. The `streamOp` receives the
    * record DF with the id materialized as `__did`. */
  private def dedupeNode(nodeId: String, inId: String, outId: String,
      idExpr: Column,
      streamOp: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
      : (Seq[(String, String)], Map[String, Entity]) = {
    val entity = Entity.KStream(Some(Xform.Custom { df =>
      if (df.isStreaming)
        streamOp(df.withColumn("__did", idExpr))
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
