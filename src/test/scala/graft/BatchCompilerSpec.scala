package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.dsl._
import graft.batch.BatchCompiler
import graft.ops.{Dedup, Keyed}

/** The reference's end-to-end topology fixtures (FIXTURES.md §1; willa
  * `core_test.clj`, `streams_test.clj`,
  * `experiment_and_ttd_congruity_test.clj`) executed through
  * Topology → BatchCompiler on a live Spark session. */
class BatchCompilerSpec extends AnyFunSuite {

  import TestKit._

  private def topic(n: String) = Entity.Topic(n)

  /** passthrough: topic→topic (core_test.clj:10-19). */
  test("passthrough") {
    val t = Topology(
      Seq("in" -> "out"),
      Map("in" -> topic("in"), "out" -> topic("out")))
    val out = BatchCompiler.run(t, Map("in" -> records(("k", 1, 100L))))("out")
    assert(kvInt(out) == Seq(("k", 1)))
  }

  /** map: topic→stream(inc)→topic (core_test.clj:21-33). */
  test("map xform") {
    val t = Topology(
      Seq("in" -> "s", "s" -> "out"),
      Map("in" -> topic("in"),
        "s" -> Entity.KStream(Some(Xform.MapValue(col("value") + 1))),
        "out" -> topic("out")))
    val out = BatchCompiler.run(t, Map("in" -> records(("k", 1, 100L))))("out")
    assert(kvInt(out) == Seq(("k", 2)))
  }

  /** chained map + filter (core_test.clj:35-51): 2,3 → inc → keep even. */
  test("chained streams") {
    val t = Topology(
      Seq("in" -> "s1", "s1" -> "s2", "s2" -> "out"),
      Map("in" -> topic("in"),
        "s1" -> Entity.KStream(Some(Xform.MapValue(col("value") + 1))),
        "s2" -> Entity.KStream(Some(Xform.Filter(col("value") % 2 === 0))),
        "out" -> topic("out")))
    val out = BatchCompiler.run(t,
      Map("in" -> records(("k", 2, 100L), ("k", 3, 200L))))("out")
    assert(kvInt(out) == Seq(("k", 4)))
  }

  /** fan-out to two sinks (core_test.clj:53-69). */
  test("fan-out") {
    val t = Topology(
      Seq("in" -> "s", "s" -> "out1", "s" -> "out2"),
      Map("in" -> topic("in"),
        "s" -> Entity.KStream(Some(Xform.MapValue(col("value") + 1))),
        "out1" -> topic("out1"), "out2" -> topic("out2")))
    val built = BatchCompiler.run(t, Map("in" -> records(("k", 1, 100L))))
    assert(kvInt(built("out1")) == Seq(("k", 2)))
    assert(kvInt(built("out2")) == Seq(("k", 2)))
  }

  /** table passthrough (core_test.clj:71-82): latest value flows through. */
  test("table passthrough") {
    val t = Topology(
      Seq("in" -> "tbl", "tbl" -> "out"),
      Map("in" -> topic("in"), "tbl" -> Entity.KTable(), "out" -> topic("out")))
    val out = BatchCompiler.run(t,
      Map("in" -> records(("k", 1, 100L), ("k", 5, 200L), ("j", 2, 150L))))("out")
    assert(kvInt(out) == Seq(("j", 2), ("k", 5)))
  }

  /** prevent-repartition divergence (core_test.clj:84-97): willa silently
    * drops key changes under the flag; we keep the key column
    * authoritative (documented in Entity.KStream). */
  test("prevent-repartition keeps key authoritative (documented divergence)") {
    val t = Topology(
      Seq("in" -> "s", "s" -> "out"),
      Map("in" -> topic("in"),
        "s" -> Entity.KStream(Some(Xform.MapKey(lit("new key"))), preventRepartition = true),
        "out" -> topic("out")))
    val out = BatchCompiler.run(t, Map("in" -> records(("k", 1, 100L))))("out")
    assert(kvInt(out) == Seq(("new key", 1)))
  }

  /** broadcast global-table joins incl. kv-mapper (core_test.clj:99-152):
    * inner → [1 2]; left with no match → [1 nil]. */
  test("global join inner and left") {
    def topo(jt: JoinType) = Topology(
      Seq("in" -> "j", "dim" -> "g", "g" -> "j", "j" -> "out"),
      Map("in" -> topic("in"), "dim" -> topic("dim"),
        "g" -> Entity.GlobalKTable(), "j" -> Entity.KStream(), "out" -> topic("out")),
      Map(Seq("in", "g") -> JoinConfig(jt)))
    val in = records(("k", 1, 100L))
    val dimHit = records(("k", 2, 50L))
    val dimMiss = records(("x", 2, 50L))
    val inner = BatchCompiler.run(topo(JoinType.Inner), Map("in" -> in, "dim" -> dimHit))("out")
    assert(inner.select("key", "value.v1", "value.v2").collect().map(_.toSeq).toSeq ==
      Seq(Seq("k", 1, 2)))
    val left = BatchCompiler.run(topo(JoinType.Left), Map("in" -> in, "dim" -> dimMiss))("out")
    assert(left.select("key", "value.v1", "value.v2").collect().map(_.toSeq).toSeq ==
      Seq(Seq("k", 1, null)))
  }

  /** kv-mapper foreign-key lookup (core_test.clj:120-152): join key is
    * computed from the stream value, not the stream key. */
  test("global join kv-mapper") {
    val t = Topology(
      Seq("in" -> "j", "dim" -> "g", "g" -> "j", "j" -> "out"),
      Map("in" -> topic("in"), "dim" -> topic("dim"),
        "g" -> Entity.GlobalKTable(), "j" -> Entity.KStream(), "out" -> topic("out")),
      Map(Seq("in", "g") -> JoinConfig(JoinType.Inner,
        kvMapper = Some((_, v) => (v * 10).cast("string")))))
    val out = BatchCompiler.run(t,
      Map("in" -> records(("k", 1, 100L)), "dim" -> records(("10", 7, 50L))))("out")
    assert(out.select("key", "value.v1", "value.v2").collect().map(_.toSeq).toSeq ==
      Seq(Seq("k", 1, 7)))
  }

  /** GlobalKTable latest-per-key reduction: two updates for the same dim
    * key must NOT duplicate the joining stream record (core.clj:109-118 →
    * Kafka GlobalKTable semantics). */
  test("global table deduplicates to latest per key") {
    val t = Topology(
      Seq("in" -> "j", "dim" -> "g", "g" -> "j", "j" -> "out"),
      Map("in" -> topic("in"), "dim" -> topic("dim"),
        "g" -> Entity.GlobalKTable(), "j" -> Entity.KStream(), "out" -> topic("out")),
      Map(Seq("in", "g") -> JoinConfig(JoinType.Inner)))
    val out = BatchCompiler.run(t,
      Map("in" -> records(("k", 1, 100L)),
        "dim" -> records(("k", 2, 50L), ("k", 9, 60L))))("out")
    assert(out.select("key", "value.v1", "value.v2").collect().map(_.toSeq).toSeq ==
      Seq(Seq("k", 1, 9)))
  }

  /** aggregate changelog emission (streams_test.clj:35-60): inputs 1,2 →
    * running outputs 1,3; the final table value is 3. */
  test("running aggregate changelog and final value") {
    val in = records(("k", 1, 100L), ("k", 2, 200L))
    val run = Keyed.runningAggregate(in, Seq("key"), Seq(col("ts")),
      sum(col("value")), "acc")
    assert(run.orderBy("ts").select("acc").collect().map(_.getLong(0)).toSeq == Seq(1L, 3L))

    val t = Topology(
      Seq("in" -> "tbl", "tbl" -> "out"),
      Map("in" -> topic("in"),
        "tbl" -> Entity.KTable(aggregate = Some(AggSpec.ExprAgg(sum(col("value"))))),
        "out" -> topic("out")))
    val out = BatchCompiler.run(t, Map("in" -> in))("out")
    assert(out.select("key", "value").collect().map(_.toSeq).toSeq == Seq(Seq("k", 3L)))
  }

  /** FoldAgg: order-sensitive (non-associative) fold follows ts order
    * (experiment.clj:231-238). acc*10 + v over values 1,2,3 → 123. */
  test("fold aggregate is timestamp-ordered") {
    val t = Topology(
      Seq("in" -> "tbl", "tbl" -> "out"),
      Map("in" -> topic("in"),
        "tbl" -> Entity.KTable(aggregate = Some(AggSpec.FoldAgg(
          lit(0), (acc, v) => acc * 10 + v))),
        "out" -> topic("out")))
    val out = BatchCompiler.run(t,
      Map("in" -> records(("k", 3, 300L), ("k", 1, 100L), ("k", 2, 200L))))("out")
    assert(out.select("value").collect().map(_.getInt(0)).toSeq == Seq(123))
  }

  /** flatMap 1→2 records (streams_test.clj:63-113): (k,1) → (k,2),(k,0). */
  test("flatMap xform") {
    val t = Topology(
      Seq("in" -> "s", "s" -> "out"),
      Map("in" -> topic("in"),
        "s" -> Entity.KStream(Some(Xform.FlatMapValue(
          array(col("value") + 1, col("value") - 1)))),
        "out" -> topic("out")))
    val out = BatchCompiler.run(t, Map("in" -> records(("k", 1, 100L)))) ("out")
    assert(kvInt(out) == Seq(("k", 0), ("k", 2)))
  }

  /** windowed sum (experiment_and_ttd_congruity_test.clj:53-91): ts 0 and
    * 50 share a 100ms window; ts 500 starts another. */
  test("tumbling window aggregate") {
    val t = Topology(
      Seq("in" -> "tbl", "tbl" -> "out"),
      Map("in" -> topic("in"),
        "tbl" -> Entity.KTable(
          window = Some(WindowSpec.TimeWindows.tumbling(100L)),
          aggregate = Some(AggSpec.ExprAgg(sum(col("value"))))),
        "out" -> topic("out")))
    val out = BatchCompiler.run(t,
      Map("in" -> records(("k", 1, 0L), ("k", 2, 50L), ("k", 5, 500L))))("out")
    assert(kvInt(out).map { case (k, v) => (k, v) } == Seq(("k", 3), ("k", 5)))
  }

  /** session windows (experiment.clj:168-185): gap 100ms merges 0,50 and
    * separates 500. */
  test("session window aggregate") {
    val t = Topology(
      Seq("in" -> "tbl", "tbl" -> "out"),
      Map("in" -> topic("in"),
        "tbl" -> Entity.KTable(
          window = Some(WindowSpec.SessionWindows(100L)),
          aggregate = Some(AggSpec.ExprAgg(sum(col("value"))))),
        "out" -> topic("out")))
    val out = BatchCompiler.run(t,
      Map("in" -> records(("k", 1, 0L), ("k", 2, 50L), ("k", 5, 500L))))("out")
    assert(kvInt(out) == Seq(("k", 3), ("k", 5)))
  }

  /** windowed stream-stream joins, in- and out-of-window
    * (experiment_and_ttd_congruity_test.clj:94-151). */
  test("stream-stream windowed join inner/left") {
    def topo(jt: JoinType, w: Long) = Topology(
      Seq("a" -> "j", "b" -> "j", "j" -> "out"),
      Map("a" -> topic("a"), "b" -> topic("b"),
        "j" -> Entity.KStream(), "out" -> topic("out")),
      Map(Seq("a", "b") -> JoinConfig(jt, Some(JoinWindow.of(w)))))
    val a = records(("k", 1, 100L))
    val bIn = records(("k", 2, 150L))   // within 100ms
    val bOut = records(("k", 2, 300L))  // outside

    val inner = BatchCompiler.run(topo(JoinType.Inner, 100L), Map("a" -> a, "b" -> bIn))("out")
    assert(inner.select("key", "value.v1", "value.v2", "ts").collect().map(r =>
      (r.getString(0), r.getInt(1), r.getInt(2), r.getTimestamp(3).getTime)).toSeq ==
      Seq(("k", 1, 2, 150L)))

    val innerMiss = BatchCompiler.run(topo(JoinType.Inner, 100L), Map("a" -> a, "b" -> bOut))("out")
    assert(innerMiss.count() == 0)

    val leftMiss = BatchCompiler.run(topo(JoinType.Left, 100L), Map("a" -> a, "b" -> bOut))("out")
    assert(leftMiss.select("key", "value.v1", "value.v2").collect().map(_.toSeq).toSeq ==
      Seq(Seq("k", 1, null)))
  }

  /** n-ary fold flattens to v1..vN (streams.clj:119-123), including when
    * a value-preserving xform (Filter) sits between joins. */
  test("n-ary join flattens across chained joins") {
    val t = Topology(
      Seq("a" -> "j1", "d1" -> "g1", "g1" -> "j1",
        "j1" -> "f", "f" -> "j2", "d2" -> "g2", "g2" -> "j2", "j2" -> "out"),
      Map("a" -> topic("a"), "d1" -> topic("d1"), "d2" -> topic("d2"),
        "g1" -> Entity.GlobalKTable(), "g2" -> Entity.GlobalKTable(),
        "j1" -> Entity.KStream(),
        "f" -> Entity.KStream(Some(Xform.Filter(col("value.v1") > 0))),
        "j2" -> Entity.KStream(), "out" -> topic("out")),
      Map(Seq("a", "g1") -> JoinConfig(JoinType.Inner),
        Seq("f", "g2") -> JoinConfig(JoinType.Inner)))
    val out = BatchCompiler.run(t, Map(
      "a" -> records(("k", 1, 100L)),
      "d1" -> records(("k", 2, 50L)),
      "d2" -> records(("k", 3, 50L))))("out")
    assert(out.schema("value").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("v1", "v2", "v3"))
    assert(out.select("value.v1", "value.v2", "value.v3").collect().map(_.toSeq).toSeq ==
      Seq(Seq(1, 2, 3)))
  }

  /** stream-table as-of join (experiment.clj:64-81): each stream record
    * sees the latest table value at ts' <= ts; a same-ts table update is
    * visible. */
  test("as-of join sees latest table value at or before stream ts") {
    val t = Topology(
      Seq("s" -> "j", "u" -> "tbl", "tbl" -> "j", "j" -> "out"),
      Map("s" -> topic("s"), "u" -> topic("u"),
        "tbl" -> Entity.KTable(), "j" -> Entity.KStream(), "out" -> topic("out")),
      Map(Seq("s", "tbl") -> JoinConfig(JoinType.Left)))
    val s = records(("k", 10, 100L), ("k", 20, 250L), ("k", 30, 50L))
    val u = records(("k", 1, 100L), ("k", 2, 200L))
    val out = BatchCompiler.run(t, Map("s" -> s, "u" -> u))("out")
    val got = out.select("value.v1", "value.v2").collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) null else r.getInt(1))).toMap
    assert(got == Map(10 -> 1, 20 -> 2, 30 -> null))
  }

  /** merge default fan-in (experiment.clj:199-201). */
  test("merge interleaves parents") {
    val t = Topology(
      Seq("a" -> "m", "b" -> "m", "m" -> "out"),
      Map("a" -> topic("a"), "b" -> topic("b"),
        "m" -> Entity.KStream(), "out" -> topic("out")))
    val out = BatchCompiler.run(t,
      Map("a" -> records(("k", 1, 100L)), "b" -> records(("j", 2, 200L))))("out")
    assert(kvInt(out) == Seq(("j", 2), ("k", 1)))
  }

  /** dedupe fragment (workflow.clj:6-24): only the first occurrence of an
    * id survives. */
  test("dedupe keeps first occurrence") {
    val in = records(("k", 7, 100L), ("k", 9, 200L), ("j", 1, 50L))
    val out = Dedup.keepFirst(in, Seq("key"), Seq("ts", "value"))
    assert(out.select("key", "value").collect().map(_.toSeq).toSeq.sortBy(_.head.toString) ==
      Seq(Seq("j", 1), Seq("k", 7)))
  }

  /** unsupported join combos error instead of silently degrading. */
  test("unsupported joins fail fast") {
    val g = Topology(
      Seq("in" -> "j", "dim" -> "g", "g" -> "j", "j" -> "out"),
      Map("in" -> topic("in"), "dim" -> topic("dim"),
        "g" -> Entity.GlobalKTable(), "j" -> Entity.KStream(), "out" -> topic("out")),
      Map(Seq("in", "g") -> JoinConfig(JoinType.Outer)))
    assertThrows[RuntimeException] {
      BatchCompiler.run(g, Map("in" -> records(("k", 1, 100L)),
        "dim" -> records(("k", 2, 50L))))
    }
    val ss = Topology(
      Seq("a" -> "j", "b" -> "j", "j" -> "out"),
      Map("a" -> topic("a"), "b" -> topic("b"),
        "j" -> Entity.KStream(), "out" -> topic("out")),
      Map(Seq("a", "b") -> JoinConfig(JoinType.Inner))) // no window
    assertThrows[RuntimeException] {
      BatchCompiler.run(ss, Map("a" -> records(("k", 1, 100L)),
        "b" -> records(("k", 2, 150L))))
    }
  }

  /** typed transducer path (#8's Dataset.flatMap form): arbitrary Scala
    * over typed records, 1→0..n outputs, key/value types may change. */
  test("typed flatMap xform") {
    import spark.implicits._
    val t = Topology(
      Seq("in" -> "s", "s" -> "out"),
      Map("in" -> topic("in"),
        "s" -> Entity.KStream(Some(Xform.typedFlatMap[String, Int, String, Int] { r =>
          if (r.value < 0) Nil
          else Seq(TRec(r.key + "!", r.value * 2, r.tsMs), TRec(r.key, r.value + 1, r.tsMs))
        })),
        "out" -> topic("out")))
    val out = BatchCompiler.run(t,
      Map("in" -> records(("k", 3, 100L), ("j", -1, 200L))))("out")
    assert(kvInt(out) == Seq(("k", 4), ("k!", 6)))
  }

  /** run-experiment parity (experiment.clj:241-263): literal records in,
    * per-entity outputs back. */
  test("experiment over literal records") {
    val t = Topology(
      Seq("in" -> "s", "s" -> "out"),
      Map("in" -> topic("in"),
        "s" -> Entity.KStream(Some(Xform.MapValue(col("value") + 1))),
        "out" -> topic("out")))
    val results = graft.batch.Experiment.resultsOnly(spark, t,
      Map("in" -> Seq(("k", 1, 100L), ("j", 5, 200L))))
    assert(results.keySet == Set("out"))
    assert(results("out").toSet == Set(("k", 2), ("j", 6)))
  }

  /** per-node builder override hook (core.clj:122-136). */
  test("builder override replaces a node") {
    val t = Topology(
      Seq("in" -> "s", "s" -> "out"),
      Map("in" -> topic("in"), "s" -> Entity.KStream(), "out" -> topic("out")))
    val out = BatchCompiler.run(t, Map("in" -> records(("k", 1, 100L))),
      overrides = Map("s" -> ((_, parents) =>
        parents.head.copy(df = parents.head.df.withColumn("value", col("value") * 100)))))("out")
    assert(kvInt(out) == Seq(("k", 100)))
  }
}
