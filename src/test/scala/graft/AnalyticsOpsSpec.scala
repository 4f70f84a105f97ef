package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Rank, Sampling, Sketches}

/** Grouped top-n, deterministic hash splits, and sketch profiles:
  * top-n must equal the window-rank form; splits must be stable pure
  * functions of identity; sketches must land within their error bounds
  * against exact answers. */
class AnalyticsOpsSpec extends AnyFunSuite {

  import TestKit._
  import spark.implicits._

  private def scored = (0 until 500).map { i =>
    (s"g${i % 5}", i.toLong, (i % 83).toDouble)
  }.toDF("g", "id", "score")

  test("topNPerGroup equals the window-rank top-n") {
    val viaHeap = Rank.topNPerGroup(scored, Seq("g"), "id", "score", n = 7)
      .select("g", "id", "score", "rank")
    val w = Window.partitionBy(col("g")).orderBy(col("score").desc, col("id").asc)
    val viaWindow = scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 7).select("g", "id", "score", "rank")
    val a = viaHeap.collect().map(_.toSeq).toSet
    val b = viaWindow.collect().map(_.toSeq).toSet
    assert(a == b)
    assert(a.size == 35) // 5 groups × 7
  }

  test("topNPerGroup partial-aggregates before the shuffle") {
    // ObjectHashAggregate/SortAggregate with a partial phase: the plan
    // must contain two aggregate nodes (partial + final), i.e. the heap
    // runs map-side
    val plan = Rank.topNPerGroup(scored, Seq("g"), "id", "score", 3)
      .queryExecution.executedPlan.toString
    assert(plan.split("Aggregate").length > 2, s"no partial aggregate in:\n$plan")
  }

  test("hashSplit is deterministic, stable under repartition, and ~weighted") {
    val docs = (0L until 2000L).toDF("doc_id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = Sampling.hashSplit(docs, "doc_id", splits, "s1")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.hashSplit(docs.repartition(13), "doc_id", splits, "s1")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
    val frac = a.values.groupBy(identity).view.mapValues(_.size / 2000.0).toMap
    assert(math.abs(frac("train") - 0.8) < 0.05)
    assert(math.abs(frac("val") - 0.1) < 0.03)
    assert(math.abs(frac("test") - 0.1) < 0.03)
    // different seed → different assignment (with overwhelming probability)
    val c = Sampling.hashSplit(docs, "doc_id", splits, "s2")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a != c)
  }

  test("hashSplit covers every row with exactly one label") {
    val docs = (0L until 100L).toDF("doc_id")
    val out = Sampling.hashSplit(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.5), "x")
    assert(out.count() == 100)
    assert(out.filter(col("split").isNull).count() == 0)
  }

  test("null ids get a null split, not the last label") {
    val docs = Seq(Some(1L), None, Some(3L)).toDF("doc_id")
    val out = Sampling.hashSplit(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.5), "x")
      .collect().map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0))) ->
        Option(r.getString(1))).toMap
    assert(out(None).isEmpty)
    assert(out(Some(1L)).nonEmpty && out(Some(3L)).nonEmpty)
  }

  test("topNPerGroup excludes null ids and scores instead of ranking them as 0") {
    val rows = Seq(
      ("g", Some(1L), Some(-5.0)), ("g", Some(2L), None),
      ("g", None, Some(99.0)), ("g", Some(4L), Some(-7.0)))
      .toDF("g", "id", "score")
    val out = Rank.topNPerGroup(rows, Seq("g"), "id", "score", 10)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    // only the two fully-defined rows rank; -5 and -7 keep their values
    assert(out == Map(1L -> -5.0, 4L -> -7.0))
  }

  test("hashSample keeps a stable ~fraction subset") {
    val docs = (0L until 2000L).toDF("doc_id")
    val s1 = Sampling.hashSample(docs, "doc_id", 0.25, "z")
      .collect().map(_.getLong(0)).toSet
    val s2 = Sampling.hashSample(docs.repartition(7), "doc_id", 0.25, "z")
      .collect().map(_.getLong(0)).toSet
    assert(s1 == s2)
    assert(math.abs(s1.size / 2000.0 - 0.25) < 0.05)
    // a sample at a higher fraction is a superset (bucket threshold form)
    val s3 = Sampling.hashSample(docs, "doc_id", 0.5, "z")
      .collect().map(_.getLong(0)).toSet
    assert(s1.subsetOf(s3))
  }

  test("mergeable HLL sketches: union of per-slice sketches ≈ global distinct") {
    // 5000 rows in 10 "days"; user ids overlap across days (mod 700)
    val rows = (0 until 5000).map(i => (i % 10, (i % 700).toLong))
      .toDF("day", "user_id")
    val daily = rows.groupBy(col("day"))
      .agg(Sketches.distinctSketch(col("user_id")).as("sk"))
    assert(daily.count() == 10)
    val merged = daily.agg(
      Sketches.sketchEstimate(
        Sketches.mergeDistinctSketches(col("sk"))).as("est"))
      .head().getLong(0)
    // union semantics: 700 distinct users overall, not sum of dailies
    assert(math.abs(merged - 700).toDouble / 700 < 0.05,
      s"merged estimate $merged vs exact 700")
  }

  test("sketch profile lands within error bounds of exact answers") {
    val rows = (0 until 10000).map { i =>
      (s"g${i % 3}", (i % 2357).toLong, (i % 101).toDouble)
    }.toDF("g", "id", "v")
    val prof = Sketches.profile(rows, Seq("g"), "id", "v").collect()
      .map(r => r.getString(r.fieldIndex("g")) -> r).toMap
    val exact = rows.groupBy("g").agg(
      countDistinct(col("id")).as("d"), expr("median(v)").as("m"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    exact.foreach { case (g, (d, m)) =>
      val r = prof(g)
      val approxD = r.getLong(r.fieldIndex("approx_ids"))
      assert(math.abs(approxD - d).toDouble / d < 0.05,
        s"group $g approx distinct $approxD vs exact $d")
      val Seq(p25, p50, p75) = Seq("val_p25", "val_p50", "val_p75")
        .map(c => r.getDouble(r.fieldIndex(c)))
      assert(p25 <= p50 && p50 <= p75)
      assert(math.abs(p50 - m) <= 2.0, s"group $g median $p50 vs exact $m")
      assert(r.getDouble(r.fieldIndex("val_min")) == 0.0 &&
        r.getDouble(r.fieldIndex("val_max")) == 100.0)
    }
  }
}
