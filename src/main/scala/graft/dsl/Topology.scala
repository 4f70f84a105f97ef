package graft.dsl

import org.apache.spark.sql.{Column, DataFrame}
import graft.graph.Dag

/** Topology-as-data DSL.
  *
  * Re-expression of the reference's declarative topology maps
  * (willa `README.md:46-53`: `:workflow` edge vector, `:entities` map,
  * `:joins` map) as an immutable Scala ADT. A topology is pure data; the
  * compilers in `graft.batch` / `graft.stream` interpret it as lazy Spark
  * plans (Catalyst replaces Kafka Streams' ProcessorTopology).
  *
  * Canonical record shape: every entity's DataFrame has columns
  * `key`, `value`, `ts` (TimestampType) — the reference's
  * `{:key k :value v :timestamp t}` record model (`experiment.clj:287-291`).
  * `value` may be any Spark SQL type, including structs (the schema-ful
  * stand-in for the reference's dynamic EDN payloads, `streams.clj:12-14`).
  */
object Records {
  val KeyCol = "key"
  val ValueCol = "value"
  val TsCol = "ts"

  /** Normalize an arbitrary table to record shape. The ts column is cast
    * to TIMESTAMP (with the session's UTC zone) so mixed NTZ/TZ inputs
    * compare and union consistently across entities. */
  def fromTable(df: DataFrame, key: Column, value: Column, ts: Column): DataFrame =
    df.select(key.as(KeyCol), value.as(ValueCol), ts.cast("timestamp").as(TsCol))
}

/** Window specifications (willa `streams.clj:162-165`, semantics
  * `experiment.clj:152-185`). All arithmetic in epoch millis. */
sealed trait WindowSpec
object WindowSpec {
  /** `advanceMs == sizeMs` = tumbling; `<` = hopping. Windows aligned to
    * multiples of advanceMs (`experiment.clj:155-165`) — exactly Spark's
    * `window(ts, size, slide)` alignment.
    *
    * `advanceMs > sizeMs` is rejected at CONSTRUCTION (Kafka Streams
    * itself disallows it): batch's `window()` would throw at analysis
    * while the streaming explode-to-covering-windows would silently DROP
    * events falling in inter-window gaps — both engines must reject the
    * spec identically, before either runs. */
  final case class TimeWindows(sizeMs: Long, advanceMs: Long) extends WindowSpec {
    require(sizeMs > 0 && advanceMs > 0,
      s"window size/advance must be positive (got size=$sizeMs, advance=$advanceMs)")
    require(advanceMs <= sizeMs,
      s"window advance ($advanceMs ms) must be <= size ($sizeMs ms): " +
        "advance > size leaves gaps no window covers (Kafka Streams' " +
        "TimeWindows.advanceBy enforces the same bound)")
  }
  object TimeWindows {
    def tumbling(sizeMs: Long): TimeWindows = TimeWindows(sizeMs, sizeMs)
  }
  /** Records ≤ gap apart merge into one session (`experiment.clj:168-185`)
    * — Spark's `session_window(ts, gap)`, INCLUSIVE at the gap boundary. */
  final case class SessionWindows(inactivityGapMs: Long) extends WindowSpec {
    require(inactivityGapMs > 0,
      s"session inactivity gap must be positive (got $inactivityGapMs)")
  }
}

/** Stream–stream join window (`JoinWindows`, semantics
  * `experiment.clj:10-34`): right ts ∈ [left ts − before, left ts + after]. */
final case class JoinWindow(beforeMs: Long, afterMs: Long)
object JoinWindow {
  def of(ms: Long): JoinWindow = JoinWindow(ms, ms)
}

sealed trait JoinType
object JoinType {
  case object Inner extends JoinType
  case object Left extends JoinType
  case object Outer extends JoinType
  /** Keyless interleave — the default fan-in when no join config exists
    * (`experiment.clj:199-201`, `streams.clj:79-82`). */
  case object Merge extends JoinType
}

/** Join configuration (willa `:joins` values, `README.md:224-230`).
  * @param kvMapper optional function of the LEFT/stream side's
  *   (key, value) columns producing the foreign key for global-table
  *   joins (`streams.clj:106`); defaults to the stream key.
  * @param asOfBucketMs skew control for stream–table as-of joins: when
  *   set, the as-of scan is split into per-key time buckets of this width
  *   ([[graft.ops.Joins.asOfBucketed]]) so a hot key's history fans out
  *   across tasks instead of serializing into one window partition.
  */
final case class JoinConfig(
    joinType: JoinType,
    window: Option[JoinWindow] = None,
    kvMapper: Option[(Column, Column) => Column] = None,
    asOfBucketMs: Option[Long] = None)

/** Stateless per-record transformation — the analogue of willa's
  * transducer `::xform` (`streams.clj:126-145`): each input record yields
  * 0..n outputs. The declarative constructors compile to Column
  * expressions so Catalyst sees through them (predicate pushdown, codegen);
  * `Custom` is the opaque escape hatch (willa's arbitrary-transducer
  * tradeoff, `README.md:31-33`). */
sealed trait Xform {
  import Records._
  def apply(df: DataFrame): DataFrame = this match {
    case Xform.MapValue(e)  => df.withColumn(ValueCol, e)
    case Xform.MapKey(e)    => df.withColumn(KeyCol, e)
    case Xform.Filter(p)    => df.filter(p)
    case Xform.FlatMapValue(arr) =>
      // mapcat: value := explode(arrayExpr) — 1 → n records, key/ts kept
      df.withColumn(ValueCol, org.apache.spark.sql.functions.explode(arr))
    case Xform.Chain(xs)    => xs.foldLeft(df)((d, x) => x(d))
    case Xform.Custom(f)    => f(df)
  }
  def andThen(next: Xform): Xform = Xform.Chain(Seq(this, next))
}
object Xform {
  /** value := expr (willa `transform-value`, `utils.clj:5-8`) */
  final case class MapValue(expr: Column) extends Xform
  /** key := expr (willa `transform-key`, `utils.clj:11-13`) */
  final case class MapKey(expr: Column) extends Xform
  /** keep records matching pred (willa `value-pred`/`key-pred`,
    * `utils.clj:16-22`) */
  final case class Filter(pred: Column) extends Xform
  /** value := explode(arrayExpr) — willa `transform-values`
    * (`utils.clj:10-14`: one record per output value, key preserved) */
  final case class FlatMapValue(arrayExpr: Column) extends Xform
  final case class Chain(xs: Seq[Xform]) extends Xform
  /** Arbitrary DataFrame transform — must preserve record shape. */
  final case class Custom(f: DataFrame => DataFrame) extends Xform

  /** Typed transducer path (the reference's arbitrary-transducer case,
    * `streams.clj:126-145`: each input record yields 0..n outputs via an
    * opaque function). The record DataFrame round-trips through
    * `Dataset[TRec[K, V]]` (ts as epoch millis, like the reference), runs
    * the closure, and converts back. Opaque to Catalyst — prefer the
    * Column-based constructors when the transform is expressible; this is
    * for logic that genuinely needs arbitrary Scala. */
  def typedFlatMap[K: org.apache.spark.sql.Encoder, V: org.apache.spark.sql.Encoder, K2, V2](
      f: TRec[K, V] => IterableOnce[TRec[K2, V2]])(
      implicit outEnc: org.apache.spark.sql.Encoder[TRec[K2, V2]],
      inEnc: org.apache.spark.sql.Encoder[TRec[K, V]]): Xform = Custom { df =>
    import org.apache.spark.sql.functions._
    val typed = df.select(
      col(Records.KeyCol).as("key"), col(Records.ValueCol).as("value"),
      unix_millis(col(Records.TsCol)).as("tsMs")).as[TRec[K, V]]
    typed.flatMap(r => f(r).iterator.to(Iterable))
      .select(col("key").as(Records.KeyCol), col("value").as(Records.ValueCol),
        timestamp_millis(col("tsMs")).as(Records.TsCol))
  }
}

/** Typed record for [[Xform.typedFlatMap]] (mirrors
  * `{:key k :value v :timestamp t}`, ts in epoch millis). */
final case class TRec[K, V](key: K, value: V, tsMs: Long)

/** Aggregation spec for KTable entities (willa
  * `::aggregate-initial-value` / `::aggregate-adder-fn` /
  * `::aggregate-subtractor-fn`, `streams.clj:41-55`). */
sealed trait AggSpec
object AggSpec {
  /** Catalyst-native aggregate over the grouped records; `expr` may use
    * `value` / `ts` columns (e.g. `sum($"value")`). Output column: `value`.
    * Batch recomputes from scratch so no subtractor is needed
    * (SURVEY §2 #19: batch recompute makes retraction unnecessary). */
  final case class ExprAgg(expr: Column) extends AggSpec
  /** Order-sensitive fold in timestamp order — exact parity with the
    * reference's adder fold (`experiment.clj:231-238`). Compiled via
    * sort-within-group; `adder` folds `value` column values. Slower than
    * ExprAgg; for parity tests and genuinely non-associative folds.
    *
    * `subtractor` is the KGroupedTable retraction fn (`streams.clj:44-50`,
    * API parity with willa's `::aggregate-subtractor-fn`). Batch recomputes
    * groups from scratch, so it is accepted but never invoked there. The
    * streaming compiler applies it when the aggregated table's parent is a
    * TABLE (member updates replace: subtract old, add new, inside the
    * co-grouped state op); over a plain stream nothing is ever replaced
    * and it is ignored, like Kafka Streams' KGroupedStream.aggregate. The
    * typed equivalent is [[graft.stream.Streamed.aggregateWithSubtractor]].
    *
    * `maxGroup`: the fold buffers each key's whole history in one
    * `collect_list` — fine for table-state cardinality, fatal for a
    * runaway hot key at scale. When set, a group over the bound fails
    * fast with the offending key in the message instead of taking the
    * executor down with it.
    *
    * `combiner` (acc-merge, Kafka Streams' session `Merger`): declares
    * the fold COMBINABLE — `combiner(fold(init, xs), fold(init, ys)) ==
    * fold(init, xs ++ ys)`. Only session-windowed streaming folds use
    * it: with a combiner, merging sessions combine their accs directly
    * and the operator keeps NO per-event buffer — state per open session
    * drops from O(events) to O(1), the exact trade Kafka Streams'
    * SessionWindows aggregate makes (`streams.clj:162-165` delegates to
    * it). The cost: an out-of-order event landing INSIDE a session's
    * span folds in arrival order (batch re-folds in event-time order),
    * so final state is guaranteed to match batch only for commutative
    * adders or in-order feeds; session MERGES still combine in
    * event-time order (sessions are disjoint). Batch ignores the
    * combiner (full recompute needs no merge).
    *
    * `maxGroup` + `combiner` together: the guard bounds a fold BUFFER,
    * and the two engines buffer differently — streaming keeps no
    * buffer under a combiner (the guard never trips there), while
    * batch still `collect_list`s each group and DOES enforce it. A
    * guarded combinable topology can therefore fail in batch while
    * running live; if the batch twin must process hot groups, leave
    * `maxGroup` unset there.
    *
    * `commutative`: REQUIRED attestation when `combiner` is set —
    * declares `adder(adder(a, x), y) == adder(adder(a, y), x)`, i.e.
    * fold order does not matter. The combinable session lowering folds
    * interior out-of-order events in ARRIVAL order (see above), so a
    * non-commutative adder would silently diverge from the batch twin;
    * rather than allow that silently, the streaming session lowering
    * REJECTS a combiner without this flag at compile time (r11 verdict
    * task 3). Batch ignores it (full recompute is always event-time
    * exact), and it is meaningless without a combiner. The streaming
    * lowering additionally SPOT-CHECKS the attestation on seeded
    * synthetic values (adder permutations + the combiner merge law,
    * driver-side, one tiny collect): a detectable violation — e.g. a
    * falsely-attested string concat — errors at lowering with the
    * counterexample. The check is probabilistic and detection-only
    * (passing proves nothing; unsynthesizable value types skip it), so
    * an UNdetected false attestation still trades batch parity for
    * O(1) state — the divergence is then on the attester. The flip
    * side: an adder commutative only over its PRODUCTION domain (e.g.
    * last-write-wins justified by all-identical payloads per key) is
    * indistinguishable from a false attestation on synthetic values
    * and is rejected — express such a fold associatively instead
    * (last-write-wins is a ts-argmax: fold a (ts, v) struct with
    * greatest(ts), genuinely commutative) or drop the combiner for
    * the buffered event-time-exact path. */
  final case class FoldAgg(
      init: Column,
      adder: (Column, Column) => Column,
      subtractor: Option[(Column, Column) => Column] = None,
      maxGroup: Option[Long] = None,
      combiner: Option[(Column, Column) => Column] = None,
      commutative: Boolean = false) extends AggSpec
}

/** Entity types (willa `core.clj:11-12` dispatch). */
sealed trait Entity
object Entity {
  /** Durable boundary node. In batch, sources resolve from the compiler's
    * `inputs` map (record-shaped DataFrames); sinks union their parents
    * (`core.clj:75-78`). `name` is the physical topic/path name.
    *
    * Admin config mirrors willa's per-topic map (`example.clj:20-25`,
    * README.md:94-99): `partitionCount` is the topic's fixed parallelism —
    * on the parquet transport it is the file count a sink writes (so
    * downstream scans plan at least that many partitions); on a Kafka
    * transport it is the partition count an admin client provisions.
    * `replicationFactor` has no single-filesystem analogue — it is carried
    * as provisioning metadata (see [[graft.sources.Admin]]). `partitionBy`
    * names record columns for directory-style layout, co-locating
    * downstream reads (no Kafka analogue; a parquet-transport extra). */
  final case class Topic(
      name: String,
      partitionCount: Option[Int] = None,
      replicationFactor: Option[Int] = None,
      partitionBy: Seq[String] = Nil) extends Entity

  /** Unbounded record stream; optional stateless xform
    * (`core.clj:81-88`). `preventRepartition` is accepted for API parity
    * with `:willa.overrides/prevent-repartition` (`core.clj:87`) but is a
    * documented no-op: Spark plans shuffles only where required
    * (`EnsureRequirements`), so there is no implicit repartition to avoid.
    * Semantics difference is intentional: willa silently DROPS key changes
    * under this flag (`core_test.clj:84-97`); we keep the key column
    * authoritative. */
  final case class KStream(
      xform: Option[Xform] = None,
      preventRepartition: Boolean = false) extends Entity

  /** Continuously-updated table (`core.clj:91-106`): optional re-key,
    * window, aggregate, suppression. Without an aggregate it is the
    * latest-value-per-key view of its parent (`streams.clj:34-39`). */
  final case class KTable(
      groupBy: Option[Column] = None,
      window: Option[WindowSpec] = None,
      aggregate: Option[AggSpec] = None,
      suppress: Boolean = false,
      storeName: Option[String] = None) extends Entity

  /** Fully-replicated broadcast table; exactly one `Topic` parent
    * (`core.clj:109-118`). */
  final case class GlobalKTable() extends Entity
}

/** The topology: workflow DAG + entity configs + join configs.
  * Join keys are matched as a SET against a node's parents
  * (`core.clj:59-62`) but Seq order is the fold order
  * (`streams.clj:119-123`). */
final case class Topology(
    workflow: Seq[(String, String)],
    entities: Map[String, Entity],
    joins: Map[Seq[String], JoinConfig] = Map.empty) {

  def predecessors: Map[String, Seq[String]] = Dag.predecessors(workflow)

  /** Topic-name → (entity-id, Topic) index (willa `utils.clj:49-54`:
    * `get-topic-name->metadata`, used by test transports). */
  def topicIndex: Map[String, (String, Entity.Topic)] =
    entities.collect { case (id, t: Entity.Topic) => t.name -> (id, t) }

  /** Join config whose input set equals this node's parent set
    * (`core.clj:59-62`). Returns the declared input order too. */
  def joinFor(parents: Seq[String]): Option[(Seq[String], JoinConfig)] =
    joins.find { case (ins, _) => ins.toSet == parents.toSet }

  /** Structural validation mirroring willa `specs.clj:113-147`.
    * Returns human-readable errors; empty = valid. */
  def validate(): Seq[String] = {
    val errs = scala.collection.mutable.ArrayBuffer.empty[String]
    if (workflow.isEmpty) errs += "workflow must have at least one edge"
    workflow.filter { case (a, b) => a == b }
      .foreach { case (a, _) => errs += s"self-loop at '$a'" }
    if (workflow.distinct.size != workflow.size)
      errs += "workflow has duplicate edges"
    if (!Dag.isDag(workflow)) errs += "workflow has a cycle (must be a DAG)"
    val nodes = Dag.nodes(workflow)
    nodes.filterNot(entities.contains)
      .foreach(n => errs += s"workflow node '$n' has no entity entry")
    // roots and leaves must be topics (specs.clj:126-133)
    (Dag.roots(workflow) ++ Dag.leaves(workflow)).toSeq.sorted.foreach { n =>
      entities.get(n) match {
        case Some(_: Entity.Topic) | None => ()
        case Some(_) => errs += s"boundary node '$n' must be a topic"
      }
    }
    // global-ktable: exactly one parent, which is a topic (core.clj:109-118)
    val preds = predecessors
    entities.collect { case (id, _: Entity.GlobalKTable) => id }
      .filter(nodes.contains).foreach { id =>
        preds(id) match {
          case Seq(p) if entities.get(p).exists(_.isInstanceOf[Entity.Topic]) => ()
          case _ => errs += s"global-ktable '$id' must have exactly one topic parent"
        }
      }
    // every join key-set must match some node's parent set
    joins.foreach { case (ins, cfg) =>
      val matched = nodes.exists(n => preds(n).toSet == ins.toSet && preds(n).size > 1)
      if (!matched) errs += s"join over ${ins.mkString("[", ",", "]")} matches no node's parents"
      // stream-stream joins need a window (the reference's JoinWindows is
      // mandatory); catching it here beats a mid-compile error
      val allStreams = ins.forall(id => entities.get(id).exists {
        case _: Entity.Topic | _: Entity.KStream => true
        case _ => false
      })
      if (matched && allStreams && cfg.joinType != JoinType.Merge && cfg.window.isEmpty)
        errs += s"stream-stream join over ${ins.mkString("[", ",", "]")} requires a JoinWindow"
    }
    errs.toSeq
  }

  def validated(): Topology = {
    val errs = validate()
    require(errs.isEmpty, s"invalid topology:\n  ${errs.mkString("\n  ")}")
    this
  }
}
