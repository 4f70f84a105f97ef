package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.dsl._
import graft.batch.BatchCompiler
import graft.viz.Dot

/** Generative topology tests mirroring willa `specs.clj:148-172`: random
  * valid topologies must validate, compile, and execute on random records;
  * random invalid ones must be rejected. Deterministically seeded. */
class TopologyGenSpec extends AnyFunSuite {

  import TestKit._

  private val genXform: Gen[Xform] = Gen.oneOf(
    Gen.choose(1, 9).map(n => Xform.MapValue(col("value") + n)),
    Gen.const(Xform.Filter(col("value") % 2 === 0)),
    Gen.const(Xform.FlatMapValue(array(col("value"), col("value") * 2))),
    Gen.const(Xform.MapKey(concat(col("key"), lit("_x")))),
    Gen.choose(1, 5).map(n =>
      Xform.MapValue(col("value") * n).andThen(Xform.Filter(col("value") >= 0))))

  private val genMiddle: Gen[Entity] = Gen.frequency(
    5 -> Gen.option(genXform).map(x => Entity.KStream(x)),
    2 -> Gen.const(Entity.KTable()),
    2 -> Gen.const(Entity.KTable(aggregate = Some(AggSpec.ExprAgg(sum(col("value")))))),
    1 -> Gen.const(Entity.KTable(
      window = Some(WindowSpec.TimeWindows.tumbling(1000L)),
      aggregate = Some(AggSpec.ExprAgg(count(lit(1)))))),
    // long init: a chain may feed BIGINT values (an upstream sum table)
    // into the fold, and Catalyst's aggregate HOF requires the acc type
    // to equal the lambda's return type (int acc + bigint v would not)
    2 -> Gen.const(Entity.KTable(
      aggregate = Some(AggSpec.FoldAgg(lit(0L), (a, v) => a + v)))),
    1 -> Gen.const(Entity.KTable(
      window = Some(WindowSpec.TimeWindows.tumbling(1000L)),
      aggregate = Some(AggSpec.FoldAgg(lit(0L), (a, v) => a + v)))),
    // session-windowed folds lower live since round 9 (merging-window
    // state op) — generate them so congruity covers random shapes
    1 -> Gen.const(Entity.KTable(
      window = Some(WindowSpec.SessionWindows(500L)),
      aggregate = Some(AggSpec.FoldAgg(lit(0L), (a, v) => a + v)))))

  /** Linear chain topic → middle* → topic, the generative shape of
    * specs.clj (boundary topics, interior derived entities). */
  private val genTopology: Gen[Topology] = for {
    n <- Gen.choose(1, 4)
    mids <- Gen.listOfN(n, genMiddle)
  } yield {
    val ids = mids.indices.map(i => s"m$i")
    val nodes = ("in" +: ids) :+ "out"
    val edges = nodes.zip(nodes.tail)
    val entities = Map("in" -> Entity.Topic("in"), "out" -> Entity.Topic("out")) ++
      ids.zip(mids).toMap
    Topology(edges, entities)
  }

  private val genRecords: Gen[Seq[(String, Int, Long)]] = for {
    n <- Gen.choose(3, 12)
    rows <- Gen.listOfN(n, for {
      k <- Gen.oneOf("a", "b", "c")
      v <- Gen.choose(-5, 20)
      t <- Gen.choose(0L, 5000L)
    } yield (k, v, t))
    // globally unique ts: a (key, ts) collision makes latest-per-key
    // ambiguous — batch tie-breaks on the order struct, streaming on
    // arrival order, and the congruity property would flake on it
  } yield rows.zipWithIndex.map { case ((k, v, t), i) => (k, v, t * 16 + i) }

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("random valid topologies validate, compile, run, and render") {
    (1L to 60L).foreach { i =>
      val topo = sample(genTopology, i)
      val rows = sample(genRecords, i * 31)
      assert(topo.validate().isEmpty, s"seed $i: ${topo.validate()}")
      val out = BatchCompiler.run(topo, Map("in" -> records(rows: _*)))("out")
      val cnt = out.count()
      assert(cnt >= 0, s"seed $i")
      val dot = Dot.render(topo)
      assert(dot.startsWith("digraph") && dot.contains("\"in\"") && dot.contains("cylinder"))
    }
  }

  test("random topologies are batch/streaming congruent") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    var qn = 0
    (1L to 40L).foreach { i =>
      val topo = sample(genTopology, i)
      // Spark's micro-batch engine rejects CHAINED stateful operators
      // without per-stage watermark design (global-watermark correctness
      // check) — the congruity property holds for single-stateful
      // topologies; multi-table chains stay covered by the batch run test
      val nTables = topo.entities.values.count(_.isInstanceOf[Entity.KTable])
      if (nTables <= 1) {
      val rows = sample(genRecords, i * 131)
      val batch = BatchCompiler.run(topo, Map("in" -> records(rows: _*)))("out")
      val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Int, Long)]
      ms.addData(rows)
      val src = ms.toDF().toDF("key", "value", "__ms")
        .withColumn("ts", timestamp_millis(col("__ms"))).drop("__ms")
      val dfs = graft.stream.StreamCompiler.run(topo, Map("in" -> src))
      qn += 1
      val name = s"gen_congruity_$qn"
      val mode = graft.stream.StreamCompiler.modeFor(topo)
      val q = dfs("out").writeStream.format("memory").queryName(name)
        .outputMode(mode).start()
      try { q.processAllAvailable() } finally q.stop()
      val got = kvInt(spark.table(name))
      if (mode == "update") {
        // FoldAgg tables emit an eager per-update changelog: every
        // batch-final row must appear among the emissions. Equality
        // can't be asserted in general — a downstream filter may pass a
        // TRANSIENT acc whose final value it rejects, an artifact shared
        // with Kafka Streams' eager emission.
        assert(kvInt(batch).toSet.subsetOf(got.toSet),
          s"seed $i: batch finals ${kvInt(batch)} not all emitted in $got")
        // …but when nothing downstream of the (single, unwindowed) table
        // is lossy AND no xform anywhere duplicates timestamps, the LAST
        // emission per key must EQUAL the batch final — transient accs
        // can hide nothing (ADVICE r8). FlatMapValue is excluded even
        // UPSTREAM: it fans one record into several with the SAME ts, so
        // "last emission per key by ts" ties and the reconstruction
        // (not the operator) becomes ambiguous.
        def lossless(x: Xform): Boolean = x match {
          case _: Xform.MapValue | _: Xform.MapKey => true
          case Xform.Chain(xs)                     => xs.forall(lossless)
          case _                                   => false
        }
        def tsUnique(x: Xform): Boolean = x match {
          case _: Xform.FlatMapValue | _: Xform.Custom => false
          case Xform.Chain(xs)                         => xs.forall(tsUnique)
          case _                                       => true
        }
        val order = topo.workflow.map(_._1) :+ topo.workflow.last._2
        val tblIdx = order.lastIndexWhere(id =>
          topo.entities(id).isInstanceOf[Entity.KTable])
        val tbl = topo.entities(order(tblIdx)).asInstanceOf[Entity.KTable]
        val tailLossless = order.drop(tblIdx + 1).forall(id =>
          topo.entities(id) match {
            case Entity.KStream(x, _) => x.forall(lossless)
            case _                    => true // topics pass through
          })
        val noTsDupes = order.forall(id => topo.entities(id) match {
          case Entity.KStream(x, _) => x.forall(tsUnique)
          case _                    => true
        })
        if (tbl.window.isEmpty && !tbl.suppress && tailLossless && noTsDupes) {
          val lastPerKey = spark.table(name)
            .withColumn("__rn", row_number().over(
              org.apache.spark.sql.expressions.Window
                .partitionBy(col("key")).orderBy(col("ts").desc)))
            .filter(col("__rn") === 1)
          assert(kvInt(lastPerKey) == kvInt(batch),
            s"seed $i: last emissions ${kvInt(lastPerKey)} != batch ${kvInt(batch)}")
        }
      } else
        assert(got == kvInt(batch), s"seed $i: streaming $got != batch ${kvInt(batch)}")
      }
    }
  }

  test("random LIVE stream-table joins are batch/streaming congruent") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    // single-batch feeds with globally unique, cross-topic-disjoint ts:
    // the state op processes in (ts, side) order with table-first ties,
    // exactly batch's as-of ordering — so the emissions are 1:1 with
    // batch's joined rows, an EXACT multiset equality (no changelog)
    var qn = 0
    (1L to 10L).foreach { seed =>
      val jt = if (seed % 2 == 0) JoinType.Left else JoinType.Inner
      val sRows = sample(genRecords, seed * 13).map { case (k, v, t) => (k, v, t * 2) }
      val uRows = sample(genRecords, seed * 29).map { case (k, v, t) => (k, v, t * 2 + 1) }
      val topo = Topology(
        Seq("s" -> "j", "u" -> "tbl", "tbl" -> "j", "j" -> "out"),
        Map("s" -> Entity.Topic("s"), "u" -> Entity.Topic("u"),
          "tbl" -> Entity.KTable(), "j" -> Entity.KStream(),
          "out" -> Entity.Topic("out")),
        Map(Seq("s", "tbl") -> JoinConfig(jt)))
      val batch = BatchCompiler.run(topo, Map(
        "s" -> records(sRows: _*), "u" -> records(uRows: _*)))("out")
      val streams = Map("s" -> sRows, "u" -> uRows).map { case (id, rows) =>
        val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Int, Long)]
        ms.addData(rows)
        id -> ms.toDF().toDF("key", "value", "__ms")
          .withColumn("ts", timestamp_millis(col("__ms"))).drop("__ms")
      }
      val dfs = graft.stream.StreamCompiler.run(topo, streams)
      qn += 1
      val name = s"gen_st_congruity_$qn"
      val q = dfs("out").writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      try { q.processAllAvailable() } finally q.stop()
      def canon(df: org.apache.spark.sql.DataFrame) = df
        .select(col("key"), col("value.v1"), col("value.v2"), col("ts"))
        .collect().map(_.toSeq).toSeq.sortBy(_.toString)
      assert(canon(spark.table(name)) == canon(batch),
        s"seed $seed ($jt): stream != batch")
    }
  }

  test("random table-join chains are batch/streaming congruent") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val jts = Seq(JoinType.Inner, JoinType.Left, JoinType.Outer)
    var qn = 0
    (1L to 12L).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val nTables = 2 + rnd.nextInt(2)
      val joinTypes = Seq.fill(nTables - 1)(jts(rnd.nextInt(3)))
      // ts disjoint ACROSS topics too: equal-ts updates on different
      // leaves would make "last emission per key" ambiguous
      def rowsFor(ti: Int) = sample(genRecords, seed * 131 + ti)
        .map { case (k, v, t) => (k, v, t * 4 + ti) }
      val topicIds = (0 until nTables).map(i => s"in$i")
      val tableIds = (0 until nTables).map(i => s"tb$i")
      val joinIds = (1 until nTables).map(i => s"j$i")
      val edges =
        topicIds.zip(tableIds) ++
          Seq(tableIds(0) -> joinIds(0), tableIds(1) -> joinIds(0)) ++
          (2 until nTables).map(i => tableIds(i) -> joinIds(i - 1)) ++
          (1 until nTables - 1).map(i => joinIds(i - 1) -> joinIds(i)) ++
          Seq(joinIds.last -> "out")
      // leaves are randomly plain (latest-per-key) or running-fold
      // aggregated tables — fold leaves join live through the same
      // co-grouped state, and batch recomputes them with the ordered fold
      def leafEntity(): Entity =
        if (rnd.nextBoolean()) Entity.KTable()
        else Entity.KTable(aggregate =
          Some(AggSpec.FoldAgg(lit(0L), (a, v) => a + v)))
      val entities: Map[String, Entity] =
        topicIds.map(id => id -> (Entity.Topic(id): Entity)).toMap ++
          tableIds.map(id => id -> leafEntity()).toMap ++
          joinIds.init.map(id => id -> (Entity.KTable(): Entity)).toMap +
          (joinIds.last -> (Entity.KStream(): Entity)) +
          ("out" -> (Entity.Topic("out"): Entity))
      val joins =
        Map(Seq(tableIds(0), tableIds(1)) -> JoinConfig(joinTypes(0))) ++
          (2 until nTables).map(i =>
            Seq(joinIds(i - 2), tableIds(i)) -> JoinConfig(joinTypes(i - 1))).toMap
      val topo = Topology(edges, entities, joins)
      assert(topo.validate().isEmpty, s"seed $seed: ${topo.validate()}")
      val inputs = topicIds.zipWithIndex.map { case (id, i) => id -> rowsFor(i) }.toMap
      val batch = BatchCompiler.run(topo,
        inputs.map { case (k, v) => k -> records(v: _*) })(joinIds.last)
      val streams = inputs.map { case (id, rows) =>
        val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Int, Long)]
        ms.addData(rows)
        id -> ms.toDF().toDF("key", "value", "__ms")
          .withColumn("ts", timestamp_millis(col("__ms"))).drop("__ms")
      }
      val dfs = graft.stream.StreamCompiler.run(topo, streams)
      qn += 1
      val name = s"gen_join_congruity_$qn"
      val q = dfs(joinIds.last).writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      try { q.processAllAvailable() } finally q.stop()
      def canonBatch(df: org.apache.spark.sql.DataFrame) =
        df.select(col("key"), col("value").cast("string"))
          .collect().map(_.toSeq).toSeq.sortBy(_.toString)
      val got = spark.table(name)
        .withColumn("__rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("key")).orderBy(col("ts").desc)))
        .filter(col("__rn") === 1)
        .select(col("key"), col("value").cast("string"))
        .collect().map(_.toSeq).toSeq.sortBy(_.toString)
      assert(got == canonBatch(batch),
        s"seed $seed ($nTables tables, $joinTypes): $got != ${canonBatch(batch)}")
    }
  }

  test("invalid topologies are rejected") {
    // cycle
    assert(Topology(Seq("a" -> "b", "b" -> "a"),
      Map("a" -> Entity.Topic("a"), "b" -> Entity.Topic("b"))).validate().nonEmpty)
    // non-topic boundary
    assert(Topology(Seq("a" -> "b"),
      Map("a" -> Entity.KStream(), "b" -> Entity.Topic("b"))).validate().nonEmpty)
    // missing entity
    assert(Topology(Seq("a" -> "b"),
      Map("a" -> Entity.Topic("a"))).validate().nonEmpty)
    // join matching no node's parents
    assert(Topology(Seq("a" -> "b"),
      Map("a" -> Entity.Topic("a"), "b" -> Entity.Topic("b")),
      Map(Seq("a", "z") -> JoinConfig(JoinType.Inner))).validate().nonEmpty)
    // global-ktable with non-topic parent
    assert(Topology(Seq("a" -> "s", "s" -> "g", "g" -> "out"),
      Map("a" -> Entity.Topic("a"), "s" -> Entity.KStream(),
        "g" -> Entity.GlobalKTable(), "out" -> Entity.Topic("out"))).validate().nonEmpty)
  }

  test("store-name registry reuses one materialization") {
    val topo = Topology(
      Seq("in" -> "t1", "in" -> "t2", "t1" -> "out1", "t2" -> "out2"),
      Map("in" -> Entity.Topic("in"),
        "t1" -> Entity.KTable(storeName = Some("shared")),
        "t2" -> Entity.KTable(storeName = Some("shared")),
        "out1" -> Entity.Topic("out1"), "out2" -> Entity.Topic("out2")))
    val built = BatchCompiler.run(topo, Map("in" -> records(("k", 1, 100L))))
    assert(built("t1") eq built("t2")) // same persisted DataFrame instance
    assert(kvInt(built("out1")) == Seq(("k", 1)))
    built("t1").unpersist()
  }

  test("latestPerKey hash-agg and window-rank variants agree") {
    val df = records(("k", 1, 100L), ("k", 9, 300L), ("k", 4, 200L), ("j", 7, 50L))
    def canon(out: org.apache.spark.sql.DataFrame) =
      out.select("key", "value").collect().map(r => (r.getString(0), r.getInt(1))).toSeq.sorted
    val hashAgg = graft.ops.Keyed.latestPerKey(df, Seq("key"), Seq(col("ts")))
    val rank = graft.ops.Keyed.latestPerKeyRank(df, Seq("key"), Seq(col("ts")))
    assert(canon(hashAgg) == canon(rank))
    assert(canon(hashAgg) == Seq(("j", 7), ("k", 9)))
  }

  test("viz with sampled outputs embeds rows") {
    val topo = Topology(Seq("in" -> "out"),
      Map("in" -> Entity.Topic("in"), "out" -> Entity.Topic("out")))
    val built = BatchCompiler.run(topo, Map("in" -> records(("k", 42, 100L))))
    val dot = Dot.renderWithSamples(topo, built, 2)
    assert(dot.contains("42"))
  }

  test("topic index maps names to entities") {
    val t = Topology(Seq("in" -> "out"),
      Map("in" -> Entity.Topic("input-topic"), "out" -> Entity.Topic("output-topic")))
    assert(t.topicIndex.keySet == Set("input-topic", "output-topic"))
    assert(t.topicIndex("input-topic")._1 == "in")
  }
}
