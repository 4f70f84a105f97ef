package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Similarity, StringSim}

/** [[graft.ops.StringSim]] + [[graft.ops.Similarity.annRecall]]: hand
  * fixtures with known answers, and the completeness property that
  * matters — the filter-and-verify plans return EXACTLY the brute-force
  * pair sets on randomized inputs (the prefix filter may only ever drop
  * non-matching candidates, never matching ones). */
class StringSimSpec extends AnyFunSuite {

  import TestKit._
  import spark.implicits._

  /** Driver-side reference edit distance (classic DP). */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def editPairsBrute(ss: Seq[String], k: Int): Set[(Long, Long, Long)] =
    (for {
      i <- ss.indices; j <- ss.indices if i < j
      d = lev(ss(i), ss(j)) if d <= k
    } yield (i.toLong, j.toLong, d.toLong)).toSet

  private def editPairsOp(ss: Seq[String], k: Int, q: Int): Set[(Long, Long, Long)] = {
    val df = ss.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    StringSim.editDistanceJoin(df, "id", "s", k, q).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("editDistanceJoin: hand fixture incl. short-string bucket") {
    // shorts (len < k*q + q = 6 for k=2, q=2) must still pair up
    val ss = Seq("abcd", "abxd", "zzzz", "the quick brown fox",
      "the quick brown fax", "a completely different sentence")
    val got = editPairsOp(ss, k = 2, q = 2)
    assert(got === Set((0L, 1L, 1L), (3L, 4L, 1L)))
  }

  test("editDistanceJoin: identical strings, distance zero") {
    val got = editPairsOp(Seq("same title", "same title", "other"), 3, 2)
    assert(got === Set((0L, 1L, 0L)))
  }

  test("editDistanceJoin completeness property vs brute force") {
    val rnd = new scala.util.Random(20260815L)
    for (round <- 0 until 3) {
      val alpha = "abc"
      val ss = (0 until 36).map { _ =>
        val len = rnd.nextInt(13) // 0..12 crosses the short-bucket bound
        (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      }
      for (k <- Seq(1, 2)) {
        val brute = editPairsBrute(ss, k)
        val got = editPairsOp(ss, k, q = 2)
        assert(got === brute, s"round=$round k=$k")
      }
    }
  }

  test("editDistanceJoin with blockOn: only within-block pairs, property") {
    val rnd = new scala.util.Random(7L)
    val rows = (0 until 30).map { i =>
      val len = rnd.nextInt(11)
      val s = (0 until len).map(_ => "ab" (rnd.nextInt(2))).mkString
      (i.toLong, s, "blk" + rnd.nextInt(2))
    }
    val df = rows.toDF("id", "s", "b")
    val got = graft.ops.StringSim
      .editDistanceJoin(df, "id", "s", 2, 2, blockOn = Seq("b"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val want = (for {
      i <- rows.indices; j <- rows.indices if i < j
      if rows(i)._3 == rows(j)._3
      d = lev(rows(i)._2, rows(j)._2) if d <= 2
    } yield (rows(i)._3, i.toLong, j.toLong, d.toLong)).toSet
    assert(got === want)
  }

  test("editDistanceJoin with lengthBand: identical results to unbanded, property") {
    // strings spread over many length bands, lengths straddling band
    // boundaries (the neighbor-probe direction is what's under test:
    // a true pair split across adjacent bands must still be found)
    val rnd = new scala.util.Random(1515L)
    val ss = (0 until 40).map { _ =>
      val len = 1 + rnd.nextInt(24)
      (0 until len).map(_ => "ab" (rnd.nextInt(2))).mkString
    }
    val df = ss.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    for (k <- Seq(1, 2); band <- Seq(k, k + 2)) {
      val brute = editPairsBrute(ss, k)
      val got = StringSim.editDistanceJoin(df, "id", "s", k, q = 2,
          lengthBand = band)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === brute, s"k=$k band=$band")
    }
    // band narrower than maxDist would drop pairs — rejected up front
    intercept[IllegalArgumentException] {
      StringSim.editDistanceJoin(df, "id", "s", 3, q = 2, lengthBand = 2)
    }
  }

  test("band-saturation guard fires on an over-full band and names the routing") {
    // 60 same-length strings = ONE saturated (block, band) cell; the
    // guard must fail the job loudly, not let the self-join run quadratic
    val df = (0 until 60).map(i => (i.toLong, "abcdefgh" + (i % 10)))
      .toDF("id", "s")
    val e = intercept[Exception] {
      StringSim.editDistanceJoin(df, "id", "s", maxDist = 2, q = 2,
        lengthBand = 2, maxBandOccupancy = 50).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val all = msgs(e).mkString("\n")
    assert(all.contains("maxBandOccupancy"), s"unexpected error: $all")
    assert(all.contains("editDistanceLookup"), "error must name the routing")
    // same corpus under the bound: identical rows to the unguarded form
    val guarded = StringSim.editDistanceJoin(df, "id", "s", maxDist = 2,
        q = 2, lengthBand = 2, maxBandOccupancy = 60)
      .collect().map(_.toSeq).toSet
    val off = StringSim.editDistanceJoin(df, "id", "s", maxDist = 2,
        q = 2, lengthBand = 2, maxBandOccupancy = 0)
      .collect().map(_.toSeq).toSet
    assert(guarded === off && guarded.nonEmpty)
  }

  test("editDistanceJoin with blockOn AND lengthBand together") {
    val rnd = new scala.util.Random(77L)
    val rows = (0 until 30).map { i =>
      val len = 1 + rnd.nextInt(15)
      val s = (0 until len).map(_ => "ab" (rnd.nextInt(2))).mkString
      (i.toLong, s, "blk" + rnd.nextInt(2))
    }
    val df = rows.toDF("id", "s", "b")
    val got = StringSim
      .editDistanceJoin(df, "id", "s", 2, 2, blockOn = Seq("b"),
        lengthBand = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val want = (for {
      i <- rows.indices; j <- rows.indices if i < j
      if rows(i)._3 == rows(j)._3
      d = lev(rows(i)._2, rows(j)._2) if d <= 2
    } yield (rows(i)._3, i.toLong, j.toLong, d.toLong)).toSet
    assert(got === want)
  }

  test("editDistanceLookup completeness property vs brute force") {
    val rnd = new scala.util.Random(99L)
    val corpus = (0 until 40).map { i =>
      val len = rnd.nextInt(13)
      (i.toLong, (0 until len).map(_ => "abc" (rnd.nextInt(3))).mkString)
    }
    val probe = corpus.take(6) ++ Seq((100L, "cabacaba"), (101L, ""))
    val cDf = corpus.toDF("id", "s")
    val pDf = probe.toDF("id", "s")
    for (k <- Seq(1, 2)) {
      val got = graft.ops.StringSim
        .editDistanceLookup(pDf, "id", "s", cDf, "id", "s", k, 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = (for {
        (pi, ps) <- probe; (ci, cs) <- corpus
        d = lev(ps, cs) if d <= k
      } yield (pi, ci, d.toLong)).toSet
      assert(got === want, s"k=$k")
    }
  }

  /** Driver-side reference containment over distinct n-gram shingles. */
  private def contBrute(docs: Seq[String], n: Int, tauBp: Int)
      : Set[(Long, Long, Long, Long, Long)] = {
    val sh = docs.map(_.split(" ", -1).toSeq.sliding(n)
      .filter(_.size == n).map(_.mkString(" ")).toSet)
    (for {
      a <- docs.indices; b <- docs.indices
      if a != b && sh(a).nonEmpty
      inter = (sh(a) intersect sh(b)).size.toLong
      if inter * 10000 >= tauBp.toLong * sh(a).size
    } yield (a.toLong, b.toLong, inter, sh(a).size.toLong,
      inter * 10000 / sh(a).size)).toSet
  }

  test("containmentJoin: hand fixture — asymmetric subsumption") {
    val small = "x y z w v" // shingles: {x y z, y z w, z w v} (3)
    val big = s"a b c d e $small f g h" // contains all 3 of small's
    val docs = Seq(small, big, "p q r s t u")
    val df = docs.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "t")
    val got = StringSim.containmentJoin(df, "id", "t", n = 3, tauBp = 10000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    // small ⊂ big at 100%; big ⊄ small (3 of 12 shingles)
    assert(got === Set((0L, 1L, 3L, 3L, 10000L)))
  }

  test("containmentJoin completeness property vs brute force") {
    val rnd = new scala.util.Random(42L)
    val vocab = Seq("a", "b", "c", "d", "e", "f")
    val docs = (0 until 30).map { _ =>
      val len = 2 + rnd.nextInt(12) // below-n docs exercise the empty guard
      (0 until len).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val df = docs.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "t")
    for (tauBp <- Seq(5000, 8000, 10000)) {
      val got = StringSim.containmentJoin(df, "id", "t", 3, tauBp)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      assert(got === contBrute(docs, 3, tauBp), s"tauBp=$tauBp")
    }
  }

  test("annRecall: hand fixture — cross-bucket misses counted exactly") {
    // two sign-opposite clusters in the first 2 dims; signBits=2, no probes
    val vecs = Seq(
      (0L, Array(1.0f, 1.0f)), (1L, Array(0.9f, 1.0f)),
      (2L, Array(-1.0f, -1.0f)), (3L, Array(-0.9f, -1.0f)))
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity.annRecall(df, "vec_id", "embedding",
        df.filter(col("vec_id") === 0L), "vec_id", "embedding",
        k = 3, signBits = 2, probeHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    // bucket (+,+) holds {0, 1} → found 2; exact top-3 = {0, 1, 3}
    // (cos(v0,v3) ≈ −0.999 beats cos(v0,v2) = −1) → hits {0, 1}
    assert(got === Set((0L, 2L, 2L, 6666L)))
  }

  test("annRecall: probing every Hamming-1 cell reaches full recall here") {
    val vecs = Seq(
      (0L, Array(1.0f, 1.0f)), (1L, Array(0.9f, 1.0f)),
      (2L, Array(-1.0f, 1.0f)), (3L, Array(1.0f, -1.0f)))
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity.annRecall(df, "vec_id", "embedding",
        df.filter(col("vec_id") === 0L), "vec_id", "embedding",
        k = 3, signBits = 2, probeHamming = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    // probes cover buckets 3, 2, 1 → candidates {0,1,2,3}; top-3 found
    assert(got === Set((0L, 3L, 3L, 10000L)))
  }
}
