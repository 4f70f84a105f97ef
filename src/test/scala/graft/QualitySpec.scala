package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Quality
import graft.ops.Quality._

/** [[graft.ops.Quality.check]]: each rule's violation count on a
  * fixture with planted defects, single-job shape, and input guards. */
class QualitySpec extends AnyFunSuite {

  import TestKit._
  import spark.implicits._

  private val df = Seq(
    (Some(1L), Some("a"), Some(10L), Some("view")),
    (Some(2L), None, Some(-5L), Some("click")),      // null name, low
    (Some(2L), Some("c"), Some(150L), Some("weird")), // dup id, high, bad type
    (Some(3L), Some("d"), None, None)                 // nulls are not range/set violations
  ).toDF("id", "name", "v", "t")

  test("check: planted defects are counted per rule; rule order is preserved") {
    val got = Quality.check(df, Seq(
      NotNull("name"), Unique("id"), InRange("v", 0L, 100L),
      InSet("t", Seq("view", "click")), NotNull("id")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5))).toSeq.sortBy(_._1)
    assert(got == Seq(
      (1L, "not_null(name)", "name", 4L, 1L, false),
      (2L, "unique(id)", "id", 4L, 1L, false),
      (3L, "in_range(v,0,100)", "v", 4L, 2L, false),
      (4L, "in_set(t)", "t", 4L, 1L, false),
      (5L, "not_null(id)", "id", 4L, 0L, true)))
  }

  test("check: an all-clean frame passes every rule; empty frame yields zero counts") {
    val clean = Seq((1L, "x"), (2L, "y")).toDF("id", "name")
    assert(Quality.check(clean, Seq(NotNull("id"), Unique("id"), NotNull("name")))
      .collect().forall(_.getBoolean(5)))
    val empty = clean.filter("id < 0")
    val got = Quality.check(empty, Seq(NotNull("id"), Unique("id"))).collect()
    assert(got.length == 2 &&
      got.forall(r => r.getLong(3) == 0L && r.getLong(4) == 0L && r.getBoolean(5)))
  }

  test("check: duplicate rule names and empty rule lists are rejected") {
    intercept[IllegalArgumentException](Quality.check(df, Seq.empty))
    intercept[IllegalArgumentException](
      Quality.check(df, Seq(NotNull("id"), NotNull("id"))))
    intercept[IllegalArgumentException](InRange("v", 5L, 4L))
    intercept[IllegalArgumentException](InSet("t", Seq.empty))
  }

  test("referentialIntegrity: orphan multiplicities, null FKs separate, exact basis points, clean control") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(Some(1L), Some(1L), Some(9L), Some(9L), Some(9L),
      None, Some(2L)).toDF("fk") // 3 orphan ROWS on one orphan key
    val r = graft.ops.Quality.referentialIntegrity("c->p", child, "fk",
      parent, "pk").collect().head
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getBoolean(5)) ==
      (("c->p", 7L, 1L, 3L, 3L * 10000 / 6, false)))
    // clean relation passes with 0 bp
    val ok = graft.ops.Quality.referentialIntegrity("ok", parent, "pk",
      parent, "pk").collect().head
    assert(ok.getLong(3) == 0L && ok.getBoolean(5))
  }
}
