package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Joins

/** Skew-salted equi-join and bucketed range join must be result-identical
  * to their naive forms (plain join; nested-loop range predicate) — the
  * whole point of both builders is changing the PHYSICAL shape only. */
class SkewRangeJoinSpec extends AnyFunSuite {

  import TestKit._
  import spark.implicits._

  // a skewed probe side: key 1 holds half the rows
  private def probe = (0 until 400).map { i =>
    (if (i % 2 == 0) 1L else (i % 19).toLong, i.toLong)
  }.toDF("k", "pv")
  private def build = (0 until 20).map(i => (i.toLong, s"dim$i")).toDF("k", "dv")

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (Option(r.get(0)), Option(r.get(1)), Option(r.get(2))))
      .toSeq.sorted(Ordering.by((t: (Option[Any], Option[Any], Option[Any])) =>
        t.toString))

  test("salted inner join matches the plain join exactly") {
    val plain = probe.join(build, Seq("k")).select("k", "pv", "dv")
    val salt = Joins.salted(probe, build, Seq("k"), nSalts = 8)
      .select("k", "pv", "dv")
    assert(rowsOf(salt) == rowsOf(plain))
  }

  test("salted left join keeps unmatched probe rows once") {
    val probeX = probe.union(Seq((99L, 999L)).toDF("k", "pv")) // no dim 99
    val plain = probeX.join(build, Seq("k"), "left").select("k", "pv", "dv")
    val salt = Joins.salted(probeX, build, Seq("k"), nSalts = 8, "left")
      .select("k", "pv", "dv")
    assert(rowsOf(salt) == rowsOf(plain))
    assert(salt.filter(col("k") === 99).count() == 1)
  }

  test("salted rejects build-side-preserving join types") {
    intercept[IllegalArgumentException] {
      Joins.salted(probe, build, Seq("k"), 8, "full_outer")
    }
  }

  test("range join matches the nested-loop predicate, overlapping ranges") {
    val points = (0L until 300L).map(v => (v % 7, v * 10)).toDF("k", "v")
    // overlapping ranges, some spanning many buckets, some empty
    val ranges = Seq(
      (1L, 0L, 500L), (2L, 400L, 1200L), (3L, 1000L, 1005L),
      (4L, 2950L, 2990L), (5L, 5000L, 6000L), (6L, 100L, 100L))
      .toDF("rid", "lo", "hi")
    val naive = points.crossJoin(ranges)
      .filter(col("v") >= col("lo") && col("v") <= col("hi"))
      .select("rid", "k", "v")
    val bucketed = Joins.rangeJoin(points, "v", ranges, "lo", "hi",
      bucketWidth = 100).select("rid", "k", "v")
    assert(rowsOf(bucketed) == rowsOf(naive))
    assert(naive.count() > 0)
  }

  test("range join with equi keys restricts matches per key") {
    val points = (0L until 100L).map(v => (v % 2, v)).toDF("k", "v")
    val ranges = Seq((0L, 10L, 40L, 1L), (1L, 10L, 40L, 2L)).toDF("k", "lo", "hi", "rid")
    val naive = points.as("p").join(ranges.as("r"), col("p.k") === col("r.k") &&
        col("v") >= col("lo") && col("v") <= col("hi"))
      .select(col("rid"), col("p.k"), col("v"))
    val bucketed = Joins.rangeJoin(points, "v", ranges, "lo", "hi",
      bucketWidth = 16, keys = Seq("k")).select("rid", "k", "v")
    assert(rowsOf(bucketed) == rowsOf(naive))
  }

  test("range join handles negative domains") {
    val points = (-50L until 50L).map(v => (v, v)).toDF("pid", "v")
    val ranges = Seq((1L, -30L, -10L), (2L, -5L, 5L)).toDF("rid", "lo", "hi")
    val naive = points.crossJoin(ranges)
      .filter(col("v") >= col("lo") && col("v") <= col("hi"))
      .select("rid", "pid", "v")
    val bucketed = Joins.rangeJoin(points, "v", ranges, "lo", "hi",
      bucketWidth = 7).select("rid", "pid", "v")
    assert(rowsOf(bucketed) == rowsOf(naive))
  }

  test("range join fail-fasts on a range wider than maxBucketsPerRange") {
    val points = Seq((1L, 5L)).toDF("pid", "v")
    val ranges = Seq((1L, 0L, 1000000L)).toDF("rid", "lo", "hi")
    val e = intercept[Exception] {
      Joins.rangeJoin(points, "v", ranges, "lo", "hi",
        bucketWidth = 10, maxBucketsPerRange = 100).count()
    }
    assert(e.getMessage != null && e.getMessage.contains("rangeJoin"))
  }

  test("interval overlap join matches the nested-loop predicate, pairs exactly once") {
    // spans engineered so many pairs SHARE several grid cells (the
    // exactly-once filter is what's under test), plus touching-at-a-
    // point, containment, and disjoint cases
    val left = Seq(
      (1L, 0L, 250L), (2L, 90L, 110L), (3L, 100L, 100L),
      (4L, 500L, 900L), (5L, 901L, 902L), (6L, -80L, -20L))
      .toDF("lid", "s_lo", "s_hi")
    val right = Seq(
      (10L, 50L, 300L), (11L, 100L, 100L), (12L, 250L, 499L),
      (13L, 600L, 1200L), (14L, -100L, -50L), (15L, 2000L, 2100L))
      .toDF("rid", "w_lo", "w_hi")
    val naive = left.crossJoin(right)
      .filter(col("s_lo") <= col("w_hi") && col("w_lo") <= col("s_hi"))
      .select("lid", "rid", "s_lo")
    val bucketed = Joins.intervalOverlapJoin(left, "s_lo", "s_hi",
      right, "w_lo", "w_hi", bucketWidth = 100).select("lid", "rid", "s_lo")
    // rowsOf is a multiset compare: a pair surfacing in two shared
    // cells would show as a duplicate and fail here
    assert(rowsOf(bucketed) == rowsOf(naive))
    assert(naive.count() > 0)
  }

  test("interval overlap join with equi keys restricts matches per key") {
    val left = Seq((0L, 1L, 0L, 100L), (1L, 2L, 0L, 100L))
      .toDF("k", "lid", "s_lo", "s_hi")
    val right = Seq((0L, 10L, 50L, 150L), (1L, 11L, 50L, 150L),
      (0L, 12L, 200L, 300L)).toDF("k", "rid", "w_lo", "w_hi")
    val naive = left.as("l").join(right.as("r"),
        col("l.k") === col("r.k") &&
        col("s_lo") <= col("w_hi") && col("w_lo") <= col("s_hi"))
      .select(col("l.k"), col("lid"), col("rid"))
    val bucketed = Joins.intervalOverlapJoin(left, "s_lo", "s_hi",
      right, "w_lo", "w_hi", bucketWidth = 64, keys = Seq("k"))
      .select("k", "lid", "rid")
    assert(rowsOf(bucketed) == rowsOf(naive))
    assert(naive.count() == 2)
  }

  test("interval overlap join fail-fasts on degenerate spans, either side") {
    val ok = Seq((1L, 0L, 50L)).toDF("lid", "s_lo", "s_hi")
    val wide = Seq((2L, 0L, 1000000L)).toDF("rid", "w_lo", "w_hi")
    val e = intercept[Exception] {
      Joins.intervalOverlapJoin(ok, "s_lo", "s_hi", wide, "w_lo", "w_hi",
        bucketWidth = 10, maxBucketsPerRange = 100).count()
    }
    assert(e.getMessage != null && e.getMessage.contains("intervalOverlapJoin"))
    val e2 = intercept[Exception] {
      Joins.intervalOverlapJoin(wide.toDF("lid", "s_lo", "s_hi"),
        "s_lo", "s_hi", ok.toDF("rid", "w_lo", "w_hi"), "w_lo", "w_hi",
        bucketWidth = 10, maxBucketsPerRange = 100).count()
    }
    assert(e2.getMessage != null && e2.getMessage.contains("intervalOverlapJoin"))
  }
}
