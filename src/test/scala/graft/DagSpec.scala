package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.graph.Dag
import graft.dsl._

/** Pure-function layer (reference `unit/utils_test.clj`). */
class DagSpec extends AnyFunSuite {
  val wf = Seq("a" -> "b", "b" -> "c", "x" -> "c")

  test("roots and leaves") {
    assert(Dag.roots(wf) == Set("a", "x"))
    assert(Dag.leaves(wf) == Set("c"))
  }

  test("topsort respects edges") {
    val order = Dag.topsort(wf).get
    assert(order.indexOf("a") < order.indexOf("b"))
    assert(order.indexOf("b") < order.indexOf("c"))
    assert(order.indexOf("x") < order.indexOf("c"))
  }

  test("cycle detected") {
    assert(Dag.topsort(Seq("a" -> "b", "b" -> "a")).isEmpty)
    assert(!Dag.isDag(Seq("a" -> "b", "b" -> "c", "c" -> "a")))
  }

  test("predecessors keep edge order (join fold order)") {
    val preds = Dag.predecessors(Seq("l" -> "j", "r" -> "j"))
    assert(preds("j") == Seq("l", "r"))
  }
}

/** Structural validation (reference `specs.clj:113-147`). */
class TopologyValidationSpec extends AnyFunSuite {
  import Entity._
  def topic = Topic("t")

  test("valid linear topology") {
    val t = Topology(
      Seq("in" -> "s", "s" -> "out"),
      Map("in" -> Topic("in"), "s" -> KStream(), "out" -> Topic("out")))
    assert(t.validate().isEmpty)
  }

  test("boundary must be topics") {
    val t = Topology(
      Seq("in" -> "s"),
      Map("in" -> Topic("in"), "s" -> KStream()))
    assert(t.validate().exists(_.contains("boundary")))
  }

  test("self-loop, cycle, missing entity, empty workflow") {
    assert(Topology(Seq("a" -> "a"), Map("a" -> topic)).validate().nonEmpty)
    assert(Topology(Seq.empty, Map.empty).validate().nonEmpty)
    val cyc = Topology(Seq("a" -> "b", "b" -> "a"),
      Map("a" -> topic, "b" -> topic))
    assert(cyc.validate().exists(_.contains("cycle")))
    val missing = Topology(Seq("a" -> "b"), Map("a" -> topic))
    assert(missing.validate().exists(_.contains("no entity")))
  }

  test("global-ktable needs exactly one topic parent") {
    val bad = Topology(
      Seq("in" -> "s", "s" -> "g", "g" -> "out"),
      Map("in" -> topic, "s" -> KStream(), "g" -> GlobalKTable(), "out" -> topic))
    assert(bad.validate().exists(_.contains("global-ktable")))
    val good = Topology(
      Seq("in" -> "g", "g" -> "out"),
      Map("in" -> topic, "g" -> GlobalKTable(), "out" -> topic))
    // boundary check: g is interior; in/out are topics
    assert(good.validate().isEmpty)
  }

  test("join key-set must match some node's parents") {
    val t = Topology(
      Seq("a" -> "j", "b" -> "j", "j" -> "out"),
      Map("a" -> topic, "b" -> topic, "j" -> KStream(), "out" -> topic),
      Map(Seq("a", "x") -> JoinConfig(JoinType.Inner)))
    assert(t.validate().exists(_.contains("matches no node")))
  }
}
