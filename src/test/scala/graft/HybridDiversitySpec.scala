package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Retrieval, Similarity}

/** [[graft.ops.Retrieval.rrfFuse]] and [[graft.ops.Similarity
  * .mmrSelect]]: hand-computed fusions/selections on tiny fixtures,
  * then exact agreement with driver-side reference implementations
  * (the RetrievalSpec replication discipline) over seeded random
  * inputs. */
class HybridDiversitySpec extends AnyFunSuite {

  import TestKit._
  import spark.implicits._

  // ------------------------------------------------------------ rrfFuse

  private def fuse(lists: Seq[Seq[(Long, Long, Long)]], k: Int,
      c: Int = 60): Seq[(Long, Long, Double, Long, Long, Long)] =
    Retrieval.rrfFuse(
      lists.map(_.toDF("qid", "id", "rank")), "qid", "id", "rank", k, c)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSeq.sortBy(t => (t._1, t._6))

  private def round9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("rrfFuse: hand-computed two-list fusion") {
    // list A ranks: d1=1 d2=2 d3=3; list B ranks: d2=1 d4=2
    val a = Seq((0L, 1L, 1L), (0L, 2L, 2L), (0L, 3L, 3L))
    val b = Seq((0L, 2L, 1L), (0L, 4L, 2L))
    val got = fuse(Seq(a, b), k = 10)
    // d2 appears in both: 1/62 + 1/61 — wins over d1's single 1/61
    val exp = Seq(
      (0L, 2L, round9(1.0 / 62) + round9(1.0 / 61), 2L, 1L, 1L),
      (0L, 1L, round9(1.0 / 61), 1L, 1L, 2L),
      (0L, 4L, round9(1.0 / 62), 1L, 2L, 3L),
      (0L, 3L, round9(1.0 / 63), 1L, 3L, 4L))
    assert(got === exp)
  }

  test("rrfFuse: equal rrf ties break by ascending id") {
    // two docs each only in one list at the same rank -> equal score
    val a = Seq((0L, 9L, 1L))
    val b = Seq((0L, 4L, 1L))
    val got = fuse(Seq(a, b), k = 10)
    assert(got.map(_._2) === Seq(4L, 9L))
    assert(got.map(_._6) === Seq(1L, 2L))
  }

  test("rrfFuse: k caps each query independently; queries independent") {
    val a = Seq((0L, 1L, 1L), (0L, 2L, 2L), (1L, 7L, 1L))
    val b = Seq((0L, 3L, 1L), (1L, 7L, 3L))
    val got = fuse(Seq(a, b), k = 1)
    // q0: d1 (list A rank 1) and d3 (list B rank 1) tie at 1/61 -> id asc
    assert(got === Seq(
      (0L, 1L, round9(1.0 / 61), 1L, 1L, 1L),
      (1L, 7L, round9(1.0 / 61) + round9(1.0 / 63), 2L, 1L, 1L)))
  }

  test("rrfFuse: single list is a rank-preserving passthrough") {
    val a = Seq((0L, 5L, 1L), (0L, 6L, 2L), (0L, 7L, 3L))
    val got = fuse(Seq(a), k = 2)
    assert(got.map(_._2) === Seq(5L, 6L))
    assert(got.map(_._3) === Seq(round9(1.0 / 61), round9(1.0 / 62)))
  }

  test("rrfFuse: three lists sum decimal-exactly (addition-order-free)") {
    val lists = Seq(
      Seq((0L, 1L, 2L), (0L, 2L, 1L)),
      Seq((0L, 1L, 5L)),
      Seq((0L, 1L, 9L), (0L, 3L, 1L)))
    val got = fuse(lists, k = 10)
    val d1 = got.find(_._2 == 1L).get
    assert(d1._3 === round9(1.0 / 62) + round9(1.0 / 65) + round9(1.0 / 69))
    assert(d1._4 === 3L && d1._5 === 2L && d1._6 === 1L)
  }

  test("rrfFuse: matches driver-side reference on seeded random lists") {
    val rnd = new scala.util.Random(1716)
    // 3 lists × 4 queries: each list ranks a random subset of 40 ids
    val lists = (0 until 3).map { _ =>
      for {
        qid <- 0L to 3L
        (id, r) <- rnd.shuffle((0L until 40L).toList).take(12).zipWithIndex
      } yield (qid, id, r + 1L)
    }
    val got = fuse(lists, k = 8)
    // reference: exact decimal sum of round-9dp reciprocals, rank by
    // (rrf desc, id asc), top 8 per query
    val exp = lists.flatten.groupBy(t => (t._1, t._2)).toSeq
      .map { case ((qid, id), rs) =>
        val rrf = rs.map(t => BigDecimal(1.0 / (60 + t._3))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
        (qid, id, rrf, rs.size.toLong, rs.map(_._3).min)
      }
      .groupBy(_._1).toSeq.flatMap { case (_, g) =>
        g.sortBy(t => (-t._3, t._2)).take(8).zipWithIndex
          .map { case (t, i) => (t._1, t._2, t._3, t._4, t._5, i + 1L) }
      }.sortBy(t => (t._1, t._6))
    assert(got === exp)
  }

  // ---------------------------------------------------------- mmrSelect

  /** CosineSim's exact arithmetic: sequential double fold, 6-dp
    * HALF_UP. */
  private def cos6(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  private def dec9(x: Double): BigDecimal =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)

  /** Driver-side greedy MMR with the operator's exact arithmetic:
    * round-9dp products, decimal subtraction (the FMA-proof form). */
  private def referenceMmr(cand: Seq[(Long, Long, Double, Array[Float])],
      k: Int, lambda: Double): Seq[(Long, Long, Long, Double, Double)] = {
    val wDiv = 1.0 - lambda
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double, Double)]
    for (qid <- cand.map(_._1).distinct) {
      val cs = cand.filter(_._1 == qid)
      var picked = Vector.empty[(Long, Array[Float])]
      for (step <- 1 to k if picked.size < cs.size) {
        val rem = cs.filterNot(c => picked.exists(_._1 == c._2))
        val scored = rem.map { case (_, id, rel, v) =>
          val mmrd = if (picked.isEmpty) dec9(lambda * rel)
            else dec9(lambda * rel) -
              dec9(wDiv * picked.map(p => cos6(v, p._2)).max)
          (id, rel, mmrd)
        }
        val best = scored.minBy { case (id, _, mmrd) => (-mmrd, id) }
        picked :+= ((best._1, cs.find(_._2 == best._1).get._4))
        out += ((qid, step.toLong, best._1, best._2, best._3.toDouble))
      }
    }
    out.toSeq.sortBy(t => (t._1, t._2))
  }

  private def runMmr(cand: Seq[(Long, Long, Double, Array[Float])], k: Int,
      lambda: Double): Seq[(Long, Long, Long, Double, Double)] =
    Similarity.mmrSelect(
      cand.map { case (q, id, rel, v) => (q, id, rel, v.toSeq) }
        .toDF("qid", "id", "rel", "vec"),
      "qid", "id", "rel", "vec", k, lambda)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
      .toSeq.sortBy(t => (t._1, t._2))

  test("mmrSelect: redundant twin is deferred, diverse doc promoted") {
    // d1 and d2 nearly identical (both highly relevant); d3 orthogonal
    // with lower relevance. Plain top-2 = (d1, d2); MMR = (d1, d3).
    val cand = Seq(
      (0L, 1L, 0.99, Array(1f, 0f, 0f)),
      (0L, 2L, 0.98, Array(0.999f, 0.045f, 0f)),
      (0L, 3L, 0.60, Array(0f, 1f, 0f)))
    val got = runMmr(cand, k = 2, lambda = 0.7)
    assert(got.map(_._3) === Seq(1L, 3L))
    // first pick's score is bare λ·rel (round-9dp decimal)
    assert(got.head._5 === dec9(0.7 * 0.99).toDouble)
    // d3's score: λ·0.60 − (1−λ)·cos(d3, d1) = 0.42 − 0.3·0
    assert(got(1)._5 === (dec9(0.7 * 0.60) - dec9((1.0 - 0.7) * cos6(
      Array(0f, 1f, 0f), Array(1f, 0f, 0f)))).toDouble)
  }

  test("mmrSelect: fewer candidates than k yields all, in pick order") {
    val cand = Seq(
      (0L, 1L, 0.9, Array(1f, 0f)),
      (0L, 2L, 0.5, Array(0f, 1f)))
    val got = runMmr(cand, k = 5, lambda = 0.7)
    assert(got.map(_._3) === Seq(1L, 2L))
    assert(got.map(_._2) === Seq(1L, 2L))
  }

  test("mmrSelect: matches driver-side reference on seeded random data") {
    val rnd = new scala.util.Random(4242)
    val cand = for {
      qid <- 0L to 2L
      id <- 0L until 12L
    } yield {
      val v = Array.fill(6)(rnd.nextGaussian().toFloat)
      (qid, id, BigDecimal(rnd.nextDouble())
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, v)
    }
    for (lambda <- Seq(0.5, 0.7)) {
      assert(runMmr(cand, k = 5, lambda) ===
        referenceMmr(cand, k = 5, lambda))
    }
  }

  test("mmrSelect: picks are distinct per query and cover every query") {
    val rnd = new scala.util.Random(7)
    val cand = for (qid <- 0L to 1L; id <- 0L until 8L)
      yield (qid, id, rnd.nextDouble(),
        Array.fill(4)(rnd.nextGaussian().toFloat))
    val got = runMmr(cand, k = 4, lambda = 0.7)
    for (q <- 0L to 1L) {
      val picks = got.filter(_._1 == q)
      assert(picks.size === 4)
      assert(picks.map(_._3).distinct.size === 4)
      assert(picks.map(_._2) === Seq(1L, 2L, 3L, 4L))
    }
  }

  // ---------------------------------------------------- mmrSelectLocal

  private def runMmrLocal(cand: Seq[(Long, Long, Double, Array[Float])],
      k: Int, lambda: Double): Seq[(Long, Long, Long, Double, Double)] =
    Similarity.mmrSelectLocal(
      cand.map { case (q, id, rel, v) => (q, id, rel, v.toSeq) }
        .toDF("qid", "id", "rel", "vec"),
      "qid", "id", "rel", "vec", k, lambda)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
      .toSeq.sortBy(t => (t._1, t._2))

  test("mmrSelectLocal: row-for-row equal to the distributed mmrSelect " +
      "on seeded random data (both lambdas)") {
    val rnd = new scala.util.Random(90125)
    val cand = for {
      qid <- 0L to 2L
      id <- 0L until 15L
    } yield (qid, id,
      BigDecimal(rnd.nextDouble())
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      Array.fill(6)(rnd.nextGaussian().toFloat))
    for (lambda <- Seq(0.5, 0.7)) {
      assert(runMmrLocal(cand, k = 6, lambda) === runMmr(cand, k = 6, lambda))
    }
  }

  test("mmrSelectLocal: fewer candidates than k yields all, in pick order") {
    val cand = Seq(
      (0L, 1L, 0.9, Array(1f, 0f)),
      (0L, 2L, 0.5, Array(0f, 1f)))
    val got = runMmrLocal(cand, k = 5, lambda = 0.7)
    assert(got.map(_._3) === Seq(1L, 2L))
    assert(got.map(_._2) === Seq(1L, 2L))
  }

  /** Null-bearing congruity (r17 ADVICE): a null rel or null vector
    * must ride through the local form exactly as the distributed one
    * treats it (null score sorts last, null cosines skipped by the
    * penalty max) — not throw on decode. Run both forms on the same
    * null-bearing frame and compare rows, nulls included. */
  test("mmrSelectLocal: null rel / null vector match the distributed " +
      "form row-for-row") {
    val rows = Seq(
      // qid 0: d2 has null rel (never beats a scored doc, but is
      // pickable once everything scored is exhausted); d3 has a null
      // vector (scoreable by rel, contributes no penalty)
      (0L, 1L, Some(0.90), Some(Seq(1f, 0f, 0f))),
      (0L, 2L, None: Option[Double], Some(Seq(0f, 1f, 0f))),
      (0L, 3L, Some(0.80), None: Option[Seq[Float]]),
      (0L, 4L, Some(0.10), Some(Seq(0.9f, 0.1f, 0f))),
      // qid 1: ALL rels null — picks fall back to id order (the
      // NULLS-LAST window's id ASC tie rule)
      (1L, 5L, None: Option[Double], Some(Seq(1f, 0f, 0f))),
      (1L, 6L, None: Option[Double], Some(Seq(0f, 1f, 0f))))
      .toDF("qid", "id", "rel", "vec")
    def collect(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else java.lang.Double.valueOf(r.getDouble(3)),
        if (r.isNullAt(4)) null else java.lang.Double.valueOf(r.getDouble(4))))
      .toSeq.sortBy(t => (t._1, t._2))
    val dist = collect(Similarity.mmrSelect(
      rows, "qid", "id", "rel", "vec", k = 3, lambda = 0.7))
    val local = collect(Similarity.mmrSelectLocal(
      rows, "qid", "id", "rel", "vec", k = 3, lambda = 0.7))
    assert(local === dist)
    // the null-rel doc is picked only after every scored doc
    val q0 = local.filter(_._1 == 0L)
    assert(q0.map(_._3).take(3).last === 2L)
    // qid 1 picks in id order with null scores end-to-end
    val q1 = local.filter(_._1 == 1L)
    assert(q1.map(_._3) === Seq(5L, 6L) && q1.forall(_._5 == null))
  }
}
