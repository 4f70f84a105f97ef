package graft.batch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.dsl._
import graft.graph.Dag
import graft.ops.{Joins, Keyed}

/** Batch interpreter of a [[Topology]]: the Spark-native analogue of the
  * reference's pure experiment interpreter (willa `experiment.clj:241-255`)
  * — same topological traversal (`core.clj:122-133`), but each node's
  * "output" is a lazy DataFrame (Catalyst logical plan), so the whole
  * topology optimizes and executes as one distributed Spark job per sink
  * action. Per-node observability (`README.md:39-41`) falls out: every
  * intermediate node's DataFrame is in the returned map.
  *
  * Semantics: FINAL-STATE (each table/aggregate contributes its final
  * value per key/window), i.e. SQL semantics — the suppressed view of the
  * reference's eager changelog emission (divergence documented in
  * SURVEY §7.3; the changelog form is available via
  * [[graft.ops.Keyed.runningAggregate]]).
  */
object BatchCompiler {

  import Records._

  /** How a built node participates in downstream joins — the analogue of
    * the reference's joinable coercion (`core.clj:40-56`,
    * `experiment.clj:134-138`). */
  sealed trait Kind
  object Kind {
    case object Stream extends Kind
    case object Table extends Kind
    case object Global extends Kind
  }

  /** @param df        node output, record shape (+ window_start/end for
    *                  windowed tables)
    * @param kind      join-dispatch class
    * @param nFields   >0 when `value` is a join-struct of that many
    *                  `v1..vN` fields (n-ary join fold, `streams.clj:119-123`)
    * @param changelog for tables: the full update history (used by as-of
    *                  stream–table joins, `experiment.clj:64-81`). Lazy
    *                  (thunk): the running-aggregate form is only valid /
    *                  only paid for when an as-of join actually consumes
    *                  it. */
  final case class Built(
      df: DataFrame,
      kind: Kind,
      nFields: Int = 0,
      changelog: Option[() => DataFrame] = None)

  /** Per-node builder override hook (`core.clj:122-136`,
    * `build-topology-unsafe!`): the reference's extensibility story. */
  type Override = (Entity, Seq[Built]) => Built

  /** Store-registry key: explicit names compare by value; auto keys
    * compare the entity by REFERENCE (eq) so only a literally shared
    * KTable instance under the same parents deduplicates. */
  sealed private trait StoreKey
  private object StoreKey {
    final case class Named(name: String) extends StoreKey
    final class Auto(val parents: Seq[String], val entity: Entity) extends StoreKey {
      override def hashCode: Int = parents.hashCode * 31 + System.identityHashCode(entity)
      override def equals(o: Any): Boolean = o match {
        case a: Auto => a.parents == parents && (a.entity eq entity)
        case _       => false
      }
    }
    object Auto {
      def apply(parents: Seq[String], e: Entity): Auto = new Auto(parents, e)
    }
  }

  /** Registry entry: the defining entity + parents, kept so a same-named
    * table with a DIFFERENT definition is rejected instead of silently
    * aliasing whichever built first (Kafka Streams likewise rejects
    * duplicate store registration). */
  private final case class StoreEntry(
      parents: Seq[String], entity: Entity.KTable, built: Built, persisted: Boolean)

  /** Result of a compiled run: every node's Built plus the DataFrames
    * this run `persist()`ed for named stores. Cached blocks live until the
    * caller releases them — call [[RunResult.unpersistStores]] when the
    * run's outputs have been consumed (or keep them deliberately for
    * cross-run reuse; they are keyed by store name, so repeated runs with
    * the same names re-persist fresh copies). */
  final case class RunResult(nodes: Map[String, Built], persistedStores: Seq[DataFrame]) {
    def unpersistStores(): Unit = persistedStores.foreach(_.unpersist())
  }

  def run(
      topology: Topology,
      inputs: Map[String, DataFrame],
      overrides: Map[String, Override] = Map.empty): Map[String, DataFrame] =
    runBuilt(topology, inputs, overrides).map { case (k, b) => k -> b.df }

  def runBuilt(
      topology: Topology,
      inputs: Map[String, DataFrame],
      overrides: Map[String, Override] = Map.empty): Map[String, Built] =
    runTracked(topology, inputs, overrides).nodes

  def runTracked(
      topology: Topology,
      inputs: Map[String, DataFrame],
      overrides: Map[String, Override] = Map.empty): RunResult = {
    topology.validated()
    val order = Dag.topsort(topology.workflow).get
    val preds = topology.predecessors
    // store-name registry (streams.clj:28-32): a KTable materialized under
    // a store name is persisted once and reused by every same-named table
    val stores = scala.collection.mutable.Map.empty[StoreKey, StoreEntry]
    val nodes = order.foldLeft(Map.empty[String, Built]) { (acc, id) =>
      val entity = topology.entities(id)
      val parents = preds(id).map(acc)
      val built = overrides.get(id) match {
        case Some(f) => f(entity, parents)
        case None    => buildNode(topology, id, entity, preds(id), parents, inputs, stores)
      }
      acc + (id -> built)
    }
    RunResult(nodes,
      stores.values.collect { case e if e.persisted => e.built.df }.toSeq)
  }

  private def buildNode(
      topology: Topology,
      id: String,
      entity: Entity,
      parentIds: Seq[String],
      parents: Seq[Built],
      inputs: Map[String, DataFrame],
      stores: scala.collection.mutable.Map[StoreKey, StoreEntry]): Built = entity match {

    case t: Entity.Topic =>
      val name = t.name
      if (parents.isEmpty) {
        val df = inputs.getOrElse(id, inputs.getOrElse(name,
          sys.error(s"no input DataFrame for source topic '$id'")))
        Built(df, Kind.Stream)
      } else {
        // sink: implicit fan-in merge of all parents (core.clj:75-78)
        val in = combineParents(topology, parentIds, parents)
        Built(asStream(in), Kind.Stream, in.nFields)
      }

    case Entity.KStream(xform, _) =>
      val in = combineParents(topology, parentIds, parents)
      val df = asStream(in)
      Built(xform.fold(df)(_.apply(df)), Kind.Stream,
        // value-preserving xforms (Filter/MapKey) keep a join-struct intact;
        // value-rewriting ones (MapValue/FlatMapValue/Custom) destroy it
        if (xform.forall(preservesValue)) in.nFields else 0)

    case t: Entity.KTable =>
      // default store naming (core.clj:95-96: store = ::store-name or a
      // parents-derived name): same-named stores share one materialization
      // — explicit names additionally persist() (user opted into reuse);
      // auto keys dedupe only a literally shared entity instance under
      // the same parents (reference identity, not a structural or
      // identity HASH — hashes can collide and alias two tables).
      val key = t.storeName match {
        case Some(name) => StoreKey.Named(name)
        case None       => StoreKey.Auto(parentIds, t)
      }
      stores.get(key) match {
        case Some(e) =>
          // reuse is only sound when the second registration is the SAME
          // materialization: same parents and a structurally identical (or
          // literally shared) entity — otherwise error out like Kafka
          // Streams does on duplicate store registration
          if (e.parents != parentIds || !((e.entity eq t) || e.entity == t))
            sys.error(s"store '${t.storeName.getOrElse(id)}' already registered " +
              s"with a different table definition (parents ${e.parents.mkString(",")})" +
              s" — same-named KTables must be structurally identical")
          e.built
        case None =>
          val b0 = buildTable(t, combineParents(topology, parentIds, parents))
          val b = if (t.storeName.isDefined) b0.copy(df = b0.df.persist()) else b0
          stores(key) = StoreEntry(parentIds, t, b, persisted = t.storeName.isDefined)
          b
      }

    case Entity.GlobalKTable() =>
      require(parents.size == 1, s"global-ktable '$id' needs exactly one parent")
      // GlobalKTable semantics are latest-value-per-key (core.clj:109-118 →
      // Kafka GlobalKTable): reduce before broadcasting so a topic with
      // multiple updates per key doesn't duplicate matching stream records.
      Built(broadcast(Keyed.latestPerKey(parents.head.df, Seq(KeyCol), Seq(col(TsCol)))),
        Kind.Global, parents.head.nFields)
  }

  /** FoldAgg's runaway-hot-key guard: a buffered fold group over
    * `maxGroup` rows raises a clear error (with the group size) at
    * execution instead of silently OOM-ing the executor that drew the
    * hot key. No-op when unset. */
  private[graft] def guardFoldGroup(pairs: Column, maxGroup: Option[Long]): Column =
    maxGroup.fold(pairs)(m =>
      when(size(pairs) <= m, pairs).otherwise(raise_error(concat(
        lit(s"FoldAgg group exceeds maxGroup=$m rows (got "),
        size(pairs).cast("string"),
        lit(") — a hot key at this cardinality needs an associative ExprAgg " +
          "or a pre-aggregation, not a buffered fold")))))

  /** THE ts-ordered fold expression — the single definition of FoldAgg's
    * batch semantics: collect (ts, value) pairs (optionally as a running
    * window), sort by ts, guard the group size, fold with Catalyst's
    * `aggregate` HOF. Shared by the batch aggregate, the batch running
    * changelog, and the streaming static-feed path, so ordering/guard
    * fixes land in one place. */
  private[graft] def foldColumn(f: AggSpec.FoldAgg,
      over: Option[org.apache.spark.sql.expressions.WindowSpec] = None): Column = {
    val collected = collect_list(struct(col(TsCol).as("o"), col(ValueCol).as("v")))
    val pairs = guardFoldGroup(
      sort_array(over.fold(collected)(collected.over)), f.maxGroup)
    aggregate(pairs, f.init, (acc, p) => f.adder(acc, p("v")))
  }

  /** Does this xform leave the `value` column untouched? (Filter and
    * MapKey never rewrite `value`, so a join-struct survives them.) */
  private def preservesValue(x: Xform): Boolean = x match {
    case _: Xform.Filter | _: Xform.MapKey => true
    case Xform.Chain(xs)                   => xs.forall(preservesValue)
    case _                                 => false
  }

  /** Coerce + join/merge parents into one stream-shaped Built
    * (`core.clj:59-68` join lookup; merge default `experiment.clj:199-201`). */
  private def combineParents(
      topology: Topology,
      parentIds: Seq[String],
      parents: Seq[Built]): Built = {
    if (parents.size == 1) return parents.head
    val byId = parentIds.zip(parents).toMap
    topology.joinFor(parentIds) match {
      case Some((declared, cfg)) =>
        // fold in declared order (streams.clj:119-123)
        declared.map(byId).reduceLeft((l, r) => joinPair(l, r, cfg))
      case None =>
        // default fan-in: merge (union)
        Built(parents.map(p => asStream(p)).reduceLeft(_ unionByName _),
          Kind.Stream)
    }
  }

  /** Binary join dispatch on (joinType, left kind, right kind) — the
    * reference's `join*` multimethod (`streams.clj:58-59`). Output value =
    * flattened struct v1..vN of all sides (reference: vector conj,
    * `streams.clj:118-123`); unjoined side = null field
    * (`core_test.clj:134`). */
  private def joinPair(l: Built, r: Built, cfg: JoinConfig): Built = {
    val nL = math.max(l.nFields, 1)
    def leftFields(c: Column): Seq[Column] =
      if (l.nFields == 0) Seq(c.as("v1"))
      else (1 to l.nFields).map(i => c.getField(s"v$i").as(s"v$i"))
    def joined(out: DataFrame): Built = Built(out, Kind.Stream, nL + 1)

    val lf = l.df.withColumnRenamed(KeyCol, "__lk")
      .withColumnRenamed(ValueCol, "__lv").withColumnRenamed(TsCol, "__lt")
    val rf = r.df.select(col(KeyCol).as("__rk"), col(ValueCol).as("__rv"),
      col(TsCol).as("__rt"))

    def out(j: DataFrame): DataFrame = j.select(
      coalesce(col("__lk"), col("__rk")).as(KeyCol),
      struct(leftFields(col("__lv")) :+ col("__rv").as(s"v${nL + 1}"): _*).as(ValueCol),
      greatest(col("__lt"), col("__rt")).as(TsCol))

    (cfg.joinType, l.kind, r.kind) match {
      case (JoinType.Merge, _, _) =>
        Built(asStream(l) unionByName asStream(r), Kind.Stream)

      case (jt @ (JoinType.Inner | JoinType.Left), Kind.Stream, Kind.Global) =>
        // foreign-key broadcast join (#30-31); kv-mapper default = key.
        // Only inner/left exist in the reference (streams.clj:104-112);
        // Outer falls through to the sys.error arm instead of mis-answering.
        val lookup = cfg.kvMapper
          .map(f => f(col("__lk"), col("__lv")))
          .getOrElse(col("__lk"))
        val how = if (jt == JoinType.Left) "left" else "inner"
        val j = lf.join(broadcast(rf), lookup === col("__rk"), how)
        joined(j.select(
          col("__lk").as(KeyCol),
          struct(leftFields(col("__lv")) :+ col("__rv").as(s"v${nL + 1}"): _*).as(ValueCol),
          col("__lt").as(TsCol)))

      case (jt, Kind.Stream, Kind.Stream) =>
        // windowed stream-stream join (#22-24). A missing window would
        // silently join only equal-ts records; the reference requires one
        // (JoinWindows is mandatory) — fail fast instead.
        val w = cfg.window.getOrElse(sys.error(
          "stream-stream join requires JoinConfig.window (JoinWindow)"))
        val how = jt match {
          case JoinType.Inner => "inner"
          case JoinType.Left  => "left"
          case JoinType.Outer => "full_outer"
          case JoinType.Merge => "inner" // unreachable
        }
        val cond = col("__lk") === col("__rk") &&
          col("__rt") >= col("__lt") - expr(s"INTERVAL ${w.beforeMs} MILLISECONDS") &&
          col("__rt") <= col("__lt") + expr(s"INTERVAL ${w.afterMs} MILLISECONDS")
        joined(out(lf.join(rf, cond, how)))

      case (jt, Kind.Table, Kind.Table) =>
        // table-table (#26-28): final-state equi-join of snapshots
        val how = jt match {
          case JoinType.Inner => "inner"
          case JoinType.Left  => "left"
          case _              => "full_outer"
        }
        joined(out(lf.join(rf, col("__lk") === col("__rk"), how)))

      case (jt @ (JoinType.Inner | JoinType.Left), Kind.Stream, Kind.Table) =>
        // stream-table as-of join (#29): latest table value at ts' <= ts.
        // Only inner/left exist (experiment.clj:123-131); Outer errors.
        val hist = r.changelog.map(_.apply()).getOrElse(r.df)
          .select(col(KeyCol), col(ValueCol), col(TsCol))
        val j = cfg.asOfBucketMs match {
          case Some(b) => Joins.asOfBucketed(
            l.df, hist, KeyCol, KeyCol, TsCol, TsCol,
            rightVal = ValueCol, rightAs = "__rv",
            inner = jt == JoinType.Inner, bucketMs = b)
          case None => Joins.asOf(
            l.df, hist, KeyCol, KeyCol, TsCol, TsCol,
            rightVal = ValueCol, rightAs = "__rv",
            inner = jt == JoinType.Inner)
        }
        joined(j.select(
          col(KeyCol),
          struct(leftFields(col(ValueCol)) :+ col("__rv").as(s"v${nL + 1}"): _*).as(ValueCol),
          col(TsCol)))

      case (jt, lk, rk) =>
        sys.error(s"unsupported join: ($jt, $lk, $rk)")
    }
  }

  /** Coerce to stream records (`core.clj:14-24`): tables' snapshots/
    * changelogs flow as records; windowed keys are unwrapped — the window
    * struct columns are dropped, the original key kept (`core.clj:20-24`). */
  private def asStream(b: Built): DataFrame = {
    val drop = b.df.columns.filter(c => c == "window_start" || c == "window_end")
    drop.foldLeft(b.df)(_ drop _)
  }

  /** KTable build chain with the reference's fixed physical ordering:
    * coerce → group-by → window → aggregate → suppress
    * (`core.clj:97-106`). */
  private def buildTable(t: Entity.KTable, in: Built): Built = {
    val rekeyed0 = asStream(in)
    // group-by re-key (#15): key := expr over (key, value) (core.clj:99)
    val rekeyed = t.groupBy.fold(rekeyed0)(e => rekeyed0.withColumn(KeyCol, e))

    val (grouped, winCols): (DataFrame, Seq[Column]) = t.window match {
      case Some(WindowSpec.TimeWindows(size, adv)) =>
        val w = window(col(TsCol), s"$size milliseconds", s"$adv milliseconds")
        (rekeyed.withColumn("__w", w), Seq(col("__w")))
      case Some(WindowSpec.SessionWindows(gap)) =>
        val w = session_window(col(TsCol), s"$gap milliseconds")
        (rekeyed.withColumn("__w", w), Seq(col("__w")))
      case None => (rekeyed, Seq.empty)
    }

    def finishWindowed(df: DataFrame): DataFrame =
      if (winCols.isEmpty) df
      else df
        .withColumn("window_start", col("__w.start"))
        .withColumn("window_end", col("__w.end"))
        .drop("__w")

    val result = t.aggregate match {
      case None =>
        // latest-per-key view (#2/#13): dedup on (key [, window])
        val keys = Seq(KeyCol) ++ (if (winCols.nonEmpty) Seq("__w") else Nil)
        finishWindowed(Keyed.latestPerKey(grouped, keys, Seq(col(TsCol))))
      case Some(AggSpec.ExprAgg(e)) =>
        val gcols = Seq(col(KeyCol)) ++ winCols
        finishWindowed(grouped.groupBy(gcols: _*)
          .agg(e.as(ValueCol), max(col(TsCol)).as(TsCol)))
      case Some(f: AggSpec.FoldAgg) =>
        val gcols = Seq(KeyCol) ++ (if (winCols.nonEmpty) Seq("__w") else Nil)
        finishWindowed(grouped.groupBy(gcols.map(col): _*)
          .agg(foldColumn(f).as(ValueCol), max(col(TsCol)).as(TsCol)))
    }
    // suppression (#20) is a no-op in batch: results are already final.
    //
    // Changelog for downstream as-of joins (#29): the table's OUTPUT
    // update stream, not its input. For a plain table that's the raw
    // rekeyed updates; for an aggregated table each update carries the
    // aggregate-so-far (reference `experiment.clj:231-238`: reductions).
    // Windowed tables have no meaningful as-of changelog — leave None so
    // joinPair falls back to the final snapshot.
    val changelog: Option[() => DataFrame] =
      if (t.window.nonEmpty) None
      else t.aggregate match {
        case None => Some(() => rekeyed)
        case Some(AggSpec.ExprAgg(e)) =>
          // running form for ANY aggregate expression — a composite expr
          // (struct of aggs, sum/count arithmetic) is handled by rewriting
          // each resolved AggregateExpression into a running window
          // (runningAggregateExpr); a bare Column.over would reject it.
          Some(() => Keyed.runningAggregateExpr(
            rekeyed, Seq(KeyCol), Seq(col(TsCol)), e, ValueCol))
        case Some(f: AggSpec.FoldAgg) =>
          Some(() => {
            val w = org.apache.spark.sql.expressions.Window
              .partitionBy(col(KeyCol)).orderBy(col(TsCol))
              .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
                org.apache.spark.sql.expressions.Window.currentRow)
            rekeyed.withColumn(ValueCol, foldColumn(f, Some(w)))
          })
      }
    Built(result, Kind.Table, 0, changelog = changelog)
  }
}
