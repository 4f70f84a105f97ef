package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.ArgExtremum
import graft.ops.{Dedup, Keyed}

/** The hash-aggregable argmax/argmin must be row-identical to the native
  * max_by/min_by/max(struct) forms it replaces (same interpreted
  * orderings), while planning as ObjectHashAggregate instead of the
  * SortAggregate fallback. */
class ArgExtremumSpec extends AnyFunSuite {

  import TestKit._
  import spark.implicits._

  private def rows = (0 until 300).map { i =>
    (s"k${i % 7}", i.toLong, s"v${(i * 31) % 13}", (i % 11).toDouble)
  }

  test("maxBy/minBy match native max_by/min_by on a shuffled multi-partition input") {
    val df = rows.toDF("k", "seq", "v", "score").repartition(7)
    val ord = struct(col("score"), col("seq"))
    val mine = df.groupBy("k").agg(
      ArgExtremum.maxBy(col("v"), ord).as("mx"),
      ArgExtremum.minBy(col("v"), ord).as("mn"))
    val native = df.groupBy("k").agg(
      max_by(col("v"), ord).as("mx"), min_by(col("v"), ord).as("mn"))
    assert(mine.collect().map(_.toSeq).toSet == native.collect().map(_.toSeq).toSet)
  }

  test("struct payloads and struct orderings round-trip (serialize path)") {
    val df = rows.toDF("k", "seq", "v", "score").repartition(5)
    val payload = struct(col("seq"), col("v"), col("score"))
    val mine = df.groupBy("k").agg(ArgExtremum.maxBy(payload, payload).as("p"))
      .select(col("k"), col("p.seq"), col("p.v"), col("p.score"))
    val native = df.groupBy("k").agg(max(payload).as("p"))
      .select(col("k"), col("p.seq"), col("p.v"), col("p.score"))
    assert(mine.collect().map(_.toSeq).toSet == native.collect().map(_.toSeq).toSet)
  }

  test("string payloads survive input-row buffer reuse (deep-copy stress)") {
    // the operator's input UnsafeRow is REUSED across rows; a shallow
    // buffer copy (GenericInternalRow.copy() returns this) leaves the
    // stored ord/value strings aliased to that buffer and the next row
    // silently rewrites them — this parity check over 20k string rows
    // failed nondeterministically under the shallow representation
    val df = (0 until 20000)
      .map(i => (s"k${i % 3}", f"s${(i * 7919) % 10007}%05d", s"p$i"))
      .toDF("k", "ord", "v").repartition(4)
    val pair = struct(col("ord"), col("v"))
    val mine = df.groupBy("k")
      .agg(ArgExtremum.maxBy(pair, pair).as("p"), ArgExtremum.minBy(pair, pair).as("q"))
      .select(col("k"), col("p.ord"), col("p.v"), col("q.ord"), col("q.v"))
    val native = df.groupBy("k").agg(max(pair).as("p"), min(pair).as("q"))
      .select(col("k"), col("p.ord"), col("p.v"), col("q.ord"), col("q.v"))
    assert(mine.collect().map(_.toSeq).toSet == native.collect().map(_.toSeq).toSet)
  }

  test("null orderings are ignored; an all-null group yields null") {
    val df = Seq(
      ("a", Some(1L), "x"), ("a", None, "IGNORED"), ("a", Some(2L), "y"),
      ("b", None, "IGNORED")).toDF("k", "ord", "v")
    val got = df.groupBy("k")
      .agg(ArgExtremum.maxBy(col("v"), col("ord")).as("top"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("a" -> "y", "b" -> null))
  }

  test("latestPerKey and keepLatest/keepFirst plan ObjectHashAggregate, not SortAggregate") {
    val df = rows.toDF("k", "seq", "v", "score")
    for (q <- Seq(
        Keyed.latestPerKey(df, Seq("k"), Seq(col("seq"))),
        Dedup.keepLatest(df, Seq("k"), Seq("seq", "v")),
        Dedup.keepFirst(df, Seq("k"), Seq("seq", "v")))) {
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("SortAggregate"), s"sort fallback in:\n$plan")
      assert(plan.contains("ObjectHashAggregate"), s"no hash agg in:\n$plan")
    }
  }

  test("keepLatest/keepFirst results are unchanged by the hash argmax") {
    val df = rows.toDF("k", "seq", "v", "score")
    val latest = Dedup.keepLatest(df, Seq("k"), Seq("seq", "v")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val first = Dedup.keepFirst(df, Seq("k"), Seq("seq", "v")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // per key: max/min seq (seq is unique, leading payload column)
    assert(latest == (0 until 7)
      .map(i => s"k$i" -> (0 until 300).filter(_ % 7 == i).max.toLong).toMap)
    assert(first == (0 until 7).map(i => s"k$i" -> i.toLong).toMap)
  }
}
