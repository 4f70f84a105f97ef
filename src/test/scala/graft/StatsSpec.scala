package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Stats

/** Integer-exact z-score outlier flags: exact boundary behavior (the
  * reason the cross-multiplied form exists) and a BigInt re-derivation
  * over random groups. */
class StatsSpec extends AnyFunSuite {

  import TestKit._
  import spark.implicits._

  test("outliersByGroup: EXACT boundary is not an outlier (strict >), zero variance flags nothing") {
    // {0,0,0,0,4}: n=5, s=4, q=16 → (n·4−s)² = 256, n·q−s² = 64.
    // z=2: 256 > 4·64 = 256 is FALSE — v=4 sits exactly at 2σ, and the
    // integer comparison decides that without a ulp of float noise.
    val df = Seq(("a", 1L, 0L), ("a", 2L, 0L), ("a", 3L, 0L),
      ("a", 4L, 0L), ("a", 5L, 4L),
      ("z", 6L, 7L), ("z", 7L, 7L)) // zero variance
      .toDF("g", "id", "v")
    def flags(z: Long) = Stats.outliersByGroup(df, "g", "v", zNum = z)
      .filter($"is_outlier").select("id").as[Long].collect().toSet
    assert(flags(2L) == Set.empty, "exactly 2 sigma is NOT > 2 sigma")
    assert(flags(1L) == Set(5L), "strictly beyond 1 sigma flags only v=4")
  }

  test("quantileBuckets: per-group boundaries, strict-greater buckets, boundary ties land low") {
    // group a: values 1..8 → exact quartile boundaries (disc) 2, 4, 6;
    // group b has its OWN distribution (10x), proving per-group binning
    val df = ((1L to 8L).map(v => ("a", v, v)) ++
      (1L to 4L).map(v => ("b", 100L + v, v * 10))).toDF("g", "id", "v")
    val got = Stats.quantileBuckets(df, "g", "v", Seq(0.25, 0.5, 0.75))
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    // a: v<=2 → 1; 3,4 → 2; 5,6 → 3; 7,8 → 4 (boundary values land LOW)
    assert((1L to 8L).map(got) == Seq(1L, 1L, 2L, 2L, 3L, 3L, 4L, 4L))
    // b: boundaries 10, 20, 30 of its own values
    assert((101L to 104L).map(got) == Seq(1L, 2L, 3L, 4L))
  }

  test("driftByGroup: hand-checked slope/r2, zero-variance nulls, sign") {
    // g=up: y = 2x exactly -> slope 2, corr2 +1; g=dn: y = -x -> -1;
    // g=flat: x constant -> both null
    val df = ((0L to 4L).map(x => ("up", x, 2 * x)) ++
      (0L to 4L).map(x => ("dn", x, 10 - x)) ++
      Seq(("flat", 3L, 1L), ("flat", 3L, 9L))).toDF("g", "x", "y")
    val got = Stats.driftByGroup(df, "g", "x", "y").collect()
      .map(r => r.getString(0) -> (r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    assert(got("up") == ((5L, Some(2.0), Some(1.0))))
    assert(got("dn") == ((5L, Some(-1.0), Some(-1.0))))
    assert(got("flat") == ((2L, None, None)))
  }

  test("property: driftByGroup == BigInt moment re-derivation (4 seeds)") {
    for (seed <- 61 to 64) {
      val rnd = new scala.util.Random(seed)
      val rows = (1L to 200L).map(_ =>
        ("g" + rnd.nextInt(3), rnd.nextInt(30).toLong, rnd.nextInt(1000).toLong))
      val got = Stats.driftByGroup(rows.toDF("g", "x", "y"), "g", "x", "y")
        .collect().map(r => r.getString(0) ->
          (Option(r.get(2)).map(_.asInstanceOf[Double]),
           Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
      val want = rows.groupBy(_._1).map { case (g, es) =>
        val n = BigInt(es.size)
        val sx = es.map(e => BigInt(e._2)).sum
        val sy = es.map(e => BigInt(e._3)).sum
        val sxx = es.map(e => BigInt(e._2) * e._2).sum
        val syy = es.map(e => BigInt(e._3) * e._3).sum
        val sxy = es.map(e => BigInt(e._2) * e._3).sum
        val cov = n * sxy - sx * sy
        val vx = n * sxx - sx * sx
        val vy = n * syy - sy * sy
        def r6(x: Double) =
          BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        val slope = if (vx == 0) None else Some(r6(cov.toDouble / vx.toDouble))
        val c2 = if (vx == 0 || vy == 0) None
          else Some(r6((if (cov < 0) -1.0 else 1.0) * cov.toDouble * cov.toDouble
            / (vx.toDouble * vy.toDouble)))
        g -> (slope, c2)
      }
      assert(got == want, s"seed=$seed")
    }
  }

  test("driftState: LIVE final stats == batch driftByGroup, under SHUFFLED arrival (moments are order-insensitive)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.stream.{Rec, Streamed}
    implicit val sql = spark.sqlContext
    val rnd = new scala.util.Random(55)
    val obs = (1L to 90L).map { i =>
      ("g" + rnd.nextInt(3), rnd.nextInt(30).toLong, rnd.nextInt(1000).toLong, i)
    }
    // arrival order deliberately != ts order: unlike the other live
    // twins, moments commute, so the final answer must still match
    val feed = rnd.shuffle(obs).map { case (g, x, y, ts) => Rec(g, (x, y), ts) }
    val ms = MemoryStream[Rec[String, (Long, Long)]]
    val q = Streamed.driftState(ms.toDS())
      .writeStream.format("memory").queryName("livedrift")
      .outputMode("update").start()
    try {
      ms.addData(feed.take(40): _*); q.processAllAvailable()
      ms.addData(feed.drop(40): _*); q.processAllAvailable()
    } finally q.stop()
    // last emission per key (max running n) is the final statistic
    val live = spark.table("livedrift").collect()
      .map(r => (r.getString(0), r.getStruct(1)))
      .groupBy(_._1).map { case (g, rows) =>
        val last = rows.map(_._2).maxBy(_.getLong(0))
        g -> (last.getLong(0),
          Option(last.get(1)).map(_.asInstanceOf[Double]),
          Option(last.get(2)).map(_.asInstanceOf[Double]))
      }
    val batch = Stats.driftByGroup(
      obs.map(o => (o._1, o._2, o._3)).toDF("g", "x", "y"), "g", "x", "y")
      .collect().map(r => r.getString(0) -> (r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    assert(live == batch)
  }

  test("winsorizedMean: clamped mean resists tails the raw mean absorbs") {
    // g: 1..19 plus a 10^6 outlier; p05/p95 of the 20 values are exact
    // order statistics (quantile_disc convention: elements 1 and 19)
    val vals = (1L to 19L) :+ 1000000L
    val df = vals.map(("g", _)).toDF("g", "v")
    val r = Stats.winsorizedMean(df, "g", "v", 0.05, 0.95).head
    assert(r.getLong(1) == 20L)
    val lo = r.getLong(2); val hi = r.getLong(3)
    assert(lo >= 1L && hi <= 19L && lo < hi)
    val rawMean = BigDecimal(vals.sum) / 20
    assert(r.getDouble(4) == (rawMean.setScale(6,
      BigDecimal.RoundingMode.HALF_UP)).toDouble)
    val wins = vals.map(v => math.max(lo, math.min(v, hi))).sum
    assert(r.getDouble(5) == (BigDecimal(wins) / 20).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getDouble(5) < r.getDouble(4) / 100) // the outlier is gone
  }

  test("property: outliersByGroup == BigInt re-derivation (4 seeds)") {
    for (seed <- 41 to 44) {
      val rnd = new scala.util.Random(seed)
      val rows = (1L to 300L).map(id =>
        ("g" + rnd.nextInt(3), id, rnd.nextInt(1000).toLong))
      val got = Stats.outliersByGroup(rows.toDF("g", "id", "v"), "g", "v",
        zNum = 3L, zDen = 2L) // z = 1.5
        .filter($"is_outlier").select("id").as[Long].collect().toSet
      val want = rows.groupBy(_._1).flatMap { case (_, es) =>
        val n = BigInt(es.size)
        val s = es.map(e => BigInt(e._3)).sum
        val q = es.map(e => BigInt(e._3) * e._3).sum
        es.collect { case (_, id, v)
          if BigInt(4) * (n * v - s) * (n * v - s) > BigInt(9) * (n * q - s * s) => id }
      }.toSet
      assert(got == want, s"seed=$seed")
    }
  }

  test("groupCard: counts, exact size totals, and micro-nat entropy") {
    // src a: 2 langs at 50/50 → H = ln 2; per-lang term
    // round(0.5·ln 0.5·−1e6) = 346574 → micro 693148.
    // src b: one lang → 1·ln 1 = −0.0 → micro 0.
    val df = Seq(
      ("a", "en", 10L), ("a", "en", 20L), ("a", "de", 5L), ("a", "de", 7L),
      ("b", "en", 100L))
      .toDF("src", "lang", "sz")
    val got = Stats.groupCard(df, "src", "lang", "sz")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5)))).toMap
    assert(got("a") == ((4L, 42L, 2L, 693148L, 0.693148)))
    assert(got("b") == ((1L, 100L, 1L, 0L, 0.0)))
  }

  test("cubeSummary: all four grouping sets, gid bits, <all> sentinel, exact totals") {
    val df = Seq(
      ("a", "en", 10L), ("a", "en", 20L), ("a", "de", 5L),
      ("b", "en", 100L))
      .toDF("src", "lang", "sz")
    val got = Stats.cubeSummary(df, Seq("src", "lang"), "sz")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.size == 3 + 2 + 2 + 1, "cells + per-src + per-lang + grand")
    assert(got(("a", "en")) == ((0L, 2L, 30L)))
    assert(got(("a", "de")) == ((0L, 1L, 5L)))
    assert(got(("b", "en")) == ((0L, 1L, 100L)))
    // gid bit 1 (MSB) = first dim (src) rolled up, bit 0 = lang
    assert(got(("a", "<all>")) == ((1L, 3L, 35L)))
    assert(got(("b", "<all>")) == ((1L, 1L, 100L)))
    assert(got(("<all>", "en")) == ((2L, 3L, 130L)))
    assert(got(("<all>", "de")) == ((2L, 1L, 5L)))
    assert(got(("<all>", "<all>")) == ((3L, 4L, 135L)))
  }

  test("cubeSummary: a genuinely-NULL dim value stays distinguishable from rolled-up") {
    val df = Seq(("a", "en", 1L), (null, "en", 2L))
      .toDF("src", "lang", "sz")
    val got = Stats.cubeSummary(df, Seq("src", "lang"), "sz")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)) -> r.getLong(4))
      .toMap
    // the NULL-src cell keeps gid 0; rolled-up src reads <all> at gid 2
    assert(got(("<all>", "en", 0L)) == 2L, "NULL src cell coalesces visually but gid=0")
    assert(got(("<all>", "en", 2L)) == 3L, "rolled-up src sums both")
  }

  test("medianMad: lower-median convention, robust vs mean, exact k boundary") {
    // group a: {1,2,3,4,100} → median 3 (lower disc), devs {2,1,0,1,97}
    // sorted {0,1,1,2,97} → MAD 1; k=3 flags |v−3| > 3: only 100.
    // The mean-based flag would be dragged by 100 (mean=22, σ≈39 —
    // nothing flags at 2σ); the median form catches it.
    val df = Seq(("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 3L),
      ("a", 4L, 4L), ("a", 5L, 100L),
      ("b", 6L, 10L), ("b", 7L, 10L)) // zero MAD group
      .toDF("g", "id", "v")
    val got = Stats.medianMad(df, "g", "v", kNum = 3L, kDen = 1L)
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(got(1L) == ((3L, 1L, false)), "dev 2 <= 3·MAD")
    assert(got(4L) == ((3L, 1L, false)))
    assert(got(5L) == ((3L, 1L, true)), "97 > 3")
    // boundary: dev == k·MAD must NOT flag (strict >)
    val df2 = Seq(("c", 1L, 0L), ("c", 2L, 1L), ("c", 3L, 2L),
      ("c", 4L, 5L)).toDF("g", "id", "v")
    // median (lower) = 1, devs {1,0,1,4} sorted {0,1,1,4} → MAD 1; k=4/1
    val got2 = Stats.medianMad(df2, "g", "v", kNum = 4L, kDen = 1L)
      .collect().map(r => r.getLong(1) -> r.getBoolean(5)).toMap
    assert(got2 == Map(1L -> false, 2L -> false, 3L -> false, 4L -> false),
      "dev 4 == 4·MAD sits exactly at the bar: strict > keeps it")
    // zero-MAD group: both at the median, nothing flags
    assert(got(6L) == ((10L, 0L, false)) && got(7L) == ((10L, 0L, false)))
  }

  test("percentilesDisc: disc cuts are observed values, per-group, one histogram pass") {
    // a: 1..8 one each → p25=2 (cum 2 ≥ 8·.25), p50=4, p75=6, p95=8
    // b: {10,10,10,40} → p25=10, p50=10, p75=10, p95=40
    val df = ((1L to 8L).map(v => ("a", v)) ++
      Seq(("b", 10L), ("b", 10L), ("b", 10L), ("b", 40L)))
      .toDF("g", "v")
    val got = Stats.percentilesDisc(df, "g", "v",
        Seq(2500, 5000, 7500, 9500))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    assert(got("a") == ((8L, 2L, 4L, 6L, 8L)))
    assert(got("b") == ((4L, 10L, 10L, 10L, 40L)))
  }

  test("groupAuc: perfect separation, midrank ties, undefined groups") {
    import graft.ops.Stats
    val rows = Seq(
      // g1: positives {3,4} all above negatives {1,2} -> AUC 1.0
      ("g1", 1L, 0L), ("g1", 2L, 0L), ("g1", 3L, 1L), ("g1", 4L, 1L),
      // g2: one pos and one neg TIED -> exactly uninformative 0.5
      ("g2", 2L, 1L), ("g2", 2L, 0L),
      // g3: no negatives -> undefined
      ("g3", 5L, 1L), ("g3", 6L, 1L)).toDF("g", "s", "y")
    val got = Stats.groupAuc(rows, Seq("g"), "y", "s")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))).toMap
    assert(got("g1") === ((2L, 2L, 8L, 10000L)))
    assert(got("g2") === ((1L, 1L, 1L, 5000L)))
    assert(got("g3") === ((2L, 0L, /* u2 */ got("g3")._3, -1L)))
  }

  test("groupAuc property: matches a driver-side midrank reference") {
    import graft.ops.Stats
    val rnd = new scala.util.Random(17)
    val rows = (0 until 300).map { _ =>
      ("g" + rnd.nextInt(3), rnd.nextInt(12).toLong, rnd.nextInt(2).toLong)
    }
    def ref(xs: Seq[(Long, Long)]): (Long, Long, Long, Long) = {
      val sorted = xs.sortBy(_._1)
      // 2x average rank per tie group
      val r2 = scala.collection.mutable.Map.empty[Long, Long]
      var i = 0
      while (i < sorted.size) {
        val v = sorted(i)._1
        val j = sorted.indexWhere(_._1 > v, i) match { case -1 => sorted.size; case k => k }
        r2(v) = 2L * (i + 1) + (j - i) - 1 // rank() is min-rank, 1-based
        i = j
      }
      val nPos = xs.count(_._2 == 1L).toLong
      val nNeg = xs.size - nPos
      val rsum2 = xs.filter(_._2 == 1L).map(x => r2(x._1)).sum
      val u2 = rsum2 - nPos * (nPos + 1)
      (nPos, nNeg, u2,
        if (nPos > 0 && nNeg > 0) Math.floorDiv(u2 * 5000, nPos * nNeg) else -1L)
    }
    val want = rows.groupBy(_._1).view.mapValues(g => ref(g.map(x => (x._2, x._3)))).toMap
    val got = Stats.groupAuc(rows.toDF("g", "s", "y"), Seq("g"), "y", "s")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))).toMap
    assert(got === want)
  }

  test("abTest: identical arms insignificant, separated arms significant, n<2 dropped") {
    import graft.ops.Stats
    val rows =
      (1 to 40).map(i => ("seg1", "R", (i % 5 + 10).toLong)) ++   // same dist
      (1 to 40).map(i => ("seg1", "A", (i % 5 + 10).toLong)) ++
      (1 to 40).map(i => ("seg2", "R", (i % 3 + 50).toLong)) ++   // far apart
      (1 to 40).map(i => ("seg2", "A", (i % 3 + 10).toLong)) ++
      Seq(("seg3", "R", 5L), ("seg3", "A", 1L), ("seg3", "A", 2L)) ++ // n_a < 2
      // seg4: both arms CONSTANT (different means) — zero pooled
      // variance, z² = Infinity; must be dropped, not cast to a verdict
      (1 to 5).map(_ => ("seg4", "R", 7L)) ++
      (1 to 5).map(_ => ("seg4", "A", 3L)) ++
      // seg5: one arm constant, the other not — variance is still
      // positive, the segment must SURVIVE the degenerate filter
      (1 to 5).map(_ => ("seg5", "R", 7L)) ++
      (1 to 5).map(i => ("seg5", "A", (i % 2 + 3).toLong)) ++
      (1 to 9).map(_ => ("seg1", "N", 999L))                      // other arm ignored
    val got = Stats.abTest(rows.toDF("seg", "arm", "v"), Seq("seg"),
        "arm", "R", "A", "v")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(5), r.getLong(6)))).toMap
    assert(!got.contains("seg3"), "variance undefined at n<2")
    assert(!got.contains("seg4"), "both-arms-constant segment dropped")
    assert(got.contains("seg5"), "one-arm-constant segment kept")
    assert(got("seg5")._4 == 1L, "clearly separated means stay significant")
    val (na1, nb1, z1, s1) = got("seg1")
    assert(na1 == 40L && nb1 == 40L && z1 == 0.0 && s1 == 0L)
    val (_, _, z2v, s2) = got("seg2")
    assert(z2v > 3.8416 && s2 == 1L)
    // z2 equals the same IEEE sequence computed driver-side
    def z(sa: Long, na: Long, qa: Long, sb: Long, nb: Long, qb: Long): Double = {
      val ma = sa.toDouble / na.toDouble; val mb = sb.toDouble / nb.toDouble
      val va = (qa.toDouble - sa.toDouble * ma) / (na - 1).toDouble / na.toDouble
      val vb = (qb.toDouble - sb.toDouble * mb) / (nb - 1).toDouble / nb.toDouble
      // exact-binary BigDecimal: what Spark's codegen round(x, 6) does
      new java.math.BigDecimal((ma - mb) * (ma - mb) / (va + vb))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    }
    val r2 = rows.filter(r => r._1 == "seg2" && r._2 == "R").map(_._3)
    val a2 = rows.filter(r => r._1 == "seg2" && r._2 == "A").map(_._3)
    assert(z2v == z(r2.sum, r2.size, r2.map(x => x * x).sum,
      a2.sum, a2.size, a2.map(x => x * x).sum))
  }

  test("proportionAb: exact verdicts at the boundary, degenerate pools insignificant") {
    import graft.ops.Stats
    def run(kA: Int, nA: Int, kB: Int, nB: Int, critBp: Long = 19600L): Long = {
      val rows = (1 to nA).map(i => ("s", "R", if (i <= kA) 1L else 0L)) ++
        (1 to nB).map(i => ("s", "A", if (i <= kB) 1L else 0L))
      Stats.proportionAb(rows.toDF("seg", "arm", "c"), Seq("seg"),
        "arm", "R", "A", "c", critBp).collect().head.getLong(5)
    }
    // driver-side double reference for calibration of the exact form
    def z2(kA: Int, nA: Int, kB: Int, nB: Int): Double = {
      val p = (kA + kB).toDouble / (nA + nB)
      val d = kA.toDouble / nA - kB.toDouble / nB
      d * d / (p * (1 - p) * (1.0 / nA + 1.0 / nB))
    }
    assert(run(200, 400, 200, 400) === 0L, "identical arms")
    assert(run(260, 400, 200, 400) === 1L, s"clear lift (z2=${z2(260,400,200,400)})")
    // straddle the 1.96 boundary and check the exact form agrees with
    // the double reference on both sides of it
    val below = (227, 400, 200, 400) // z2 = 3.6617, just under 3.8416
    val above = (228, 400, 200, 400) // z2 = 3.9393, just over
    assert(z2(below._1, below._2, below._3, below._4) < 3.8416)
    assert(z2(above._1, above._2, above._3, above._4) > 3.8416)
    assert(run(below._1, below._2, below._3, below._4) === 0L)
    assert(run(above._1, above._2, above._3, above._4) === 1L)
    assert(run(0, 50, 0, 50) === 0L, "all-failure pool is not 0 >= 0 significant")
    assert(run(50, 50, 50, 50) === 0L, "all-success pool likewise")
  }

  test("proportionAbState: LIVE final verdict == batch proportionAb under shuffled arrival, across a restart") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.stream.{Rec, Streamed}
    implicit val sql = spark.sqlContext
    val rnd = new scala.util.Random(29)
    // seg0 identical arms; seg1 lifted arm R; seg2 degenerate (all zero)
    val obs = (1 to 300).map { i =>
      val seg = "seg" + rnd.nextInt(3)
      val arm = if (rnd.nextBoolean()) "R" else "A"
      val p = seg match {
        case "seg0" => 0.5
        case "seg1" => if (arm == "R") 0.8 else 0.4
        case _      => 0.0
      }
      (seg, arm, if (rnd.nextDouble() < p) 1L else 0L)
    }
    val feed = rnd.shuffle(obs).zipWithIndex.map { case ((g, a, c), i) =>
      Rec(g, (a, c), 1000L + i)
    }
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ab-ckpt-")
    val ms = MemoryStream[Rec[String, (String, Long)]]
    val latest = scala.collection.mutable.Map.empty[String, (Long, Long, Long, Long, Long)]
    def start() = Streamed.proportionAbState(ms.toDS(), "R", "A")
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Streamed.AbOut], _: Long) =>
        val rows = b.collect()
        latest.synchronized { rows.foreach(r =>
          latest(r.segment) = (r.n_a, r.k_a, r.n_b, r.k_b, r.significant)) }
        ()
      }.start()
    val q1 = start()
    try { ms.addData(feed.take(150): _*); q1.processAllAvailable() }
    finally q1.stop() // counters must resume, not reset
    val q2 = start()
    try { ms.addData(feed.drop(150): _*); q2.processAllAvailable() }
    finally q2.stop()
    val batch = graft.ops.Stats.proportionAb(
        obs.toDF("seg", "arm", "c"), Seq("seg"), "arm", "R", "A", "c")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    assert(latest.synchronized(latest.toMap) === batch)
    assert(batch("seg1")._5 === 1L, "the planted lift is detected")
    assert(batch("seg0")._5 === 0L)
    assert(batch("seg2")._5 === 0L, "degenerate pool stays insignificant")
    org.apache.commons.io.FileUtils.deleteDirectory(ckpt.toFile)
  }

  test("groupAucHist == groupAuc row for row (random fixtures)") {
    import graft.ops.Stats
    val rnd = new scala.util.Random(31)
    val rows = (0 until 400).map { _ =>
      ("g" + rnd.nextInt(4), rnd.nextInt(9).toLong, rnd.nextInt(2).toLong)
    }.toDF("g", "s", "y")
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(canon(Stats.groupAucHist(rows, Seq("g"), "y", "s")) ===
      canon(Stats.groupAuc(rows, Seq("g"), "y", "s")))
  }

  test("calibrationTable: exact per-bucket positive rates over quartile spans") {
    import graft.ops.Stats
    // 8 values per group; label = 1 only for the top half -> top buckets
    // must read 10000bp, bottom buckets 0
    val rows = (1L to 8L).map(v => ("g", v, if (v >= 5) 1L else 0L))
    val got = Stats.calibrationTable(rows.toDF("g", "s", "y"),
        "g", "y", "s", Seq(0.25, 0.5, 0.75))
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6)))).toMap
    assert(got === Map(
      1L -> ((2L, 0L, 1L, 2L, 0L)), 2L -> ((2L, 0L, 3L, 4L, 0L)),
      3L -> ((2L, 2L, 5L, 6L, 10000L)), 4L -> ((2L, 2L, 7L, 8L, 10000L))))
  }
}
