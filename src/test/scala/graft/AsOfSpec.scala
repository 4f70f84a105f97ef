package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.dsl._
import graft.batch.BatchCompiler
import graft.ops.Joins

/** As-of join depth: the skew-resistant bucketed variant must agree with
  * the single-window form, and as-of joins against AGGREGATED tables must
  * see the running aggregate as of the stream ts (the table's output
  * changelog, willa `experiment.clj:231-238`), not the raw inputs. */
class AsOfSpec extends AnyFunSuite {

  import TestKit._

  test("bucketed as-of equals plain as-of on a dense keyed history") {
    // interleaved left lookups and right updates across many buckets,
    // including left rows before any right row (null) and left-only buckets
    val rng = new scala.util.Random(7)
    val rightRows = (1 to 60).map(i => (s"k${i % 3}", i, rng.nextInt(5000).toLong))
    val leftRows = (1 to 80).map(i => (s"k${i % 4}", i, rng.nextInt(6000).toLong))
    val right = records(rightRows: _*)
    val left = records(leftRows: _*)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("key", "ts", "value", "rv").collect()
        .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getInt(2),
          if (r.isNullAt(3)) -1 else r.getInt(3))).toSeq.sorted
    val plain = Joins.asOf(left, right, "key", "key", "ts", "ts",
      rightVal = "value", rightAs = "rv", inner = false)
    val bucketed = Joins.asOfBucketed(left, right, "key", "key", "ts", "ts",
      rightVal = "value", rightAs = "rv", inner = false, bucketMs = 500L)
    assert(canon(bucketed) == canon(plain))
    assert(canon(plain).nonEmpty)
    // inner variant agreement too
    val pInner = Joins.asOf(left, right, "key", "key", "ts", "ts", "value", "rv", inner = true)
    val bInner = Joins.asOfBucketed(left, right, "key", "key", "ts", "ts", "value", "rv",
      inner = true, bucketMs = 500L)
    assert(canon(bInner) == canon(pInner))
  }

  test("forward/nearest as-of: hand-built directions, inclusive exact-ts, backward tie") {
    // right k: values 10@100, 20@300; left lookups straddle them
    val right = records(("k", 10, 100L), ("k", 20, 300L))
    val left = records(("k", 1, 50L), ("k", 2, 100L), ("k", 3, 180L),
      ("k", 4, 200L), ("k", 5, 350L), ("x", 6, 100L))
    def got(df: org.apache.spark.sql.DataFrame) =
      df.select("key", "value", "rv").collect()
        .map(r => (r.getString(0), r.getInt(1),
          if (r.isNullAt(2)) -1 else r.getInt(2))).toSeq.sorted
    val fwd = Joins.asOfForward(left, right, "key", "key", "ts", "ts",
      "value", "rv", inner = false)
    // 50→10 (next), 100→10 (inclusive exact), 180→20, 200→20 (tie at
    // 200? no — next is 300), 350→null (nothing follows), x→null
    assert(got(fwd) == Seq(("k", 1, 10), ("k", 2, 10), ("k", 3, 20),
      ("k", 4, 20), ("k", 5, -1), ("x", 6, -1)).sorted)
    val near = Joins.asOfNearest(left, right, "key", "key", "ts", "ts",
      "value", "rv", inner = false)
    // 50→10 (only fwd), 100→10 (exact), 180→10 (80 back vs 120 fwd),
    // 200→10 (EQUIDISTANT 100 — tie resolves backward), 350→20, x→null
    assert(got(near) == Seq(("k", 1, 10), ("k", 2, 10), ("k", 3, 10),
      ("k", 4, 10), ("k", 5, 20), ("x", 6, -1)).sorted)
    // inner drops the unmatched rows only
    assert(Joins.asOfForward(left, right, "key", "key", "ts", "ts",
      "value", "rv", inner = true).count() == 4)
    assert(Joins.asOfNearest(left, right, "key", "key", "ts", "ts",
      "value", "rv", inner = true).count() == 5)
  }

  test("asOfWithin: backward match nulled past the staleness bound, inclusive exact-ts") {
    val right = records(("k", 10, 100L), ("k", 20, 300L))
    val left = records(("k", 1, 100L), ("k", 2, 180L), ("k", 3, 250L),
      ("k", 4, 350L), ("k", 5, 50L))
    def got(tolUs: Long, inner: Boolean) =
      Joins.asOfWithin(left, right, "key", "key", "ts", "ts",
        "value", "rv", toleranceUs = tolUs, inner = inner)
        .select("value", "rv").collect()
        .map(r => r.getInt(0) -> (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    // tolerance 100 ms: @100 exact (age 0), @180 age 80 ok, @250 age 150
    // STALE -> null, @350 age 50 from the 300 row, @50 no backward row
    assert(got(100000L, inner = false) ==
      Map(1 -> 10, 2 -> 10, 3 -> -1, 4 -> 20, 5 -> -1))
    // inner drops both the stale and the unmatched
    assert(Joins.asOfWithin(left, right, "key", "key", "ts", "ts",
      "value", "rv", toleranceUs = 100000L, inner = true).count() == 3)
    // unbounded-ish tolerance reproduces plain asOf
    val plain = Joins.asOf(left, right, "key", "key", "ts", "ts",
      "value", "rv", inner = false)
      .select("value", "rv").collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    assert(got(Long.MaxValue / 2, inner = false) == plain)
  }

  test("as-of against an aggregated table sees the running aggregate") {
    val topo = Topology(
      Seq("s" -> "j", "u" -> "tbl", "tbl" -> "j", "j" -> "out"),
      Map("s" -> Entity.Topic("s"), "u" -> Entity.Topic("u"),
        "tbl" -> Entity.KTable(aggregate = Some(AggSpec.ExprAgg(sum(col("value"))))),
        "j" -> Entity.KStream(), "out" -> Entity.Topic("out")))
    // table inputs: +1@100, +2@200 → running aggregate 1@100, 3@200
    val u = records(("k", 1, 100L), ("k", 2, 200L))
    // lookups: @150 must see 1 (not 3, not the raw 2); @250 sees 3; @50 null
    val s = records(("k", 10, 150L), ("k", 20, 250L), ("k", 30, 50L))
    val topoL = topo.copy(joins = Map(Seq("s", "tbl") -> JoinConfig(JoinType.Left)))
    val out = BatchCompiler.run(topoL, Map("s" -> s, "u" -> u))("out")
    val got = out.select("value.v1", "value.v2").collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) null else r.get(1))).toMap
    assert(got == Map(10 -> 1L, 20 -> 3L, 30 -> null))
  }

  test("as-of against a COMPOSITE-aggregate table windows each agg (struct of aggs)") {
    // struct(sum, count, sum/count): not a single aggregate function, so
    // Column.over rejects it — runningAggregateExpr rewrites each resolved
    // AggregateExpression into its own running window
    val topo = Topology(
      Seq("s" -> "j", "u" -> "tbl", "tbl" -> "j", "j" -> "out"),
      Map("s" -> Entity.Topic("s"), "u" -> Entity.Topic("u"),
        "tbl" -> Entity.KTable(aggregate = Some(AggSpec.ExprAgg(struct(
          sum(col("value")).as("s"),
          count(lit(1)).as("n"),
          (sum(col("value")) / count(lit(1))).as("avg"))))),
        "j" -> Entity.KStream(), "out" -> Entity.Topic("out")),
      Map(Seq("s", "tbl") -> JoinConfig(JoinType.Left)))
    // table inputs: +1@100, +3@200 → running (s,n,avg) = (1,1,1.0)@100, (4,2,2.0)@200
    val u = records(("k", 1, 100L), ("k", 3, 200L))
    val s = records(("k", 10, 150L), ("k", 20, 250L), ("k", 30, 50L))
    val out = BatchCompiler.run(topo, Map("s" -> s, "u" -> u))("out")
    val got = out.select("value.v1", "value.v2").collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) null else {
        val st = r.getStruct(1); (st.getLong(0), st.getLong(1), st.getDouble(2))
      })).toMap
    assert(got == Map(10 -> ((1L, 1L, 1.0)), 20 -> ((4L, 2L, 2.0)), 30 -> null))
  }

  test("FoldAgg maxGroup fails fast on a hot key instead of buffering it") {
    def topo(maxGroup: Option[Long]) = Topology(
      Seq("in" -> "tbl", "tbl" -> "out"),
      Map("in" -> Entity.Topic("in"),
        "tbl" -> Entity.KTable(aggregate = Some(AggSpec.FoldAgg(
          lit(0), (acc, v) => acc + v, maxGroup = maxGroup))),
        "out" -> Entity.Topic("out")))
    val rows = records(("k", 1, 100L), ("k", 2, 200L), ("k", 3, 300L), ("j", 5, 50L))
    // bound above the hot key: normal fold
    val ok = BatchCompiler.run(topo(Some(10L)), Map("in" -> rows))("out")
      .select("key", "value").collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(ok == Map("k" -> 6, "j" -> 5))
    // bound below: the error names the bound and observed size
    val err = intercept[Exception] {
      BatchCompiler.run(topo(Some(2L)), Map("in" -> rows))("out").collect()
    }
    assert(err.getMessage.contains("maxGroup=2") || Option(err.getCause)
      .exists(_.getMessage.contains("maxGroup=2")), s"got: ${err.getMessage}")
  }

  test("DSL asOfBucketMs routes through the bucketed as-of") {
    def topo(bucket: Option[Long]) = Topology(
      Seq("s" -> "j", "u" -> "tbl", "tbl" -> "j", "j" -> "out"),
      Map("s" -> Entity.Topic("s"), "u" -> Entity.Topic("u"),
        "tbl" -> Entity.KTable(), "j" -> Entity.KStream(), "out" -> Entity.Topic("out")),
      Map(Seq("s", "tbl") -> JoinConfig(JoinType.Left, asOfBucketMs = bucket)))
    val u = records(("k", 1, 100L), ("k", 2, 2000L))
    val s = records(("k", 10, 150L), ("k", 20, 2500L), ("k", 30, 50L))
    def canon(m: Map[String, org.apache.spark.sql.DataFrame]) =
      m("out").select("value.v1", "value.v2").collect()
        .map(r => (r.getInt(0), if (r.isNullAt(1)) null else r.get(1))).toMap
    val plain = canon(BatchCompiler.run(topo(None), Map("s" -> s, "u" -> u)))
    val bucketed = canon(BatchCompiler.run(topo(Some(500L)), Map("s" -> s, "u" -> u)))
    assert(plain == Map(10 -> 1, 20 -> 2, 30 -> null))
    assert(bucketed == plain)
  }

  test("as-of against a fold-aggregated table sees the running fold") {
    val topo = Topology(
      Seq("s" -> "j", "u" -> "tbl", "tbl" -> "j", "j" -> "out"),
      Map("s" -> Entity.Topic("s"), "u" -> Entity.Topic("u"),
        "tbl" -> Entity.KTable(aggregate = Some(
          AggSpec.FoldAgg(lit(0), (acc, v) => acc * 10 + v))),
        "j" -> Entity.KStream(), "out" -> Entity.Topic("out")),
      Map(Seq("s", "tbl") -> JoinConfig(JoinType.Left)))
    val u = records(("k", 1, 100L), ("k", 2, 200L), ("k", 3, 300L))
    val s = records(("k", 10, 250L))
    val out = BatchCompiler.run(topo, Map("s" -> s, "u" -> u))("out")
    // fold so far at ts 250: (0*10+1)*10+2 = 12
    assert(out.select("value.v2").collect().map(_.getInt(0)).toSeq == Seq(12))
  }
}
