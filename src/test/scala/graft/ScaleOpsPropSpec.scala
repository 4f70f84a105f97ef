package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Dedup, Joins, Packing, Rank}

/** Property tests for the scale-shape operators: on random inputs each
  * must equal its naive/semantic reference — the builders only change
  * the PHYSICAL plan. Deterministically seeded like TopologyGenSpec. */
class ScaleOpsPropSpec extends AnyFunSuite {

  import TestKit._
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private def sorted(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted

  test("prop: salted join equals plain join on random frames") {
    (1 to 4).foreach { i =>
      val probe = sample(Gen.listOfN(80,
        Gen.zip(Gen.choose(0L, 10L), Gen.choose(0L, 999L))), i)
        .toDF("k", "pv")
      val build = sample(Gen.listOfN(15,
        Gen.zip(Gen.choose(0L, 12L), Gen.alphaStr.map(_.take(4)))), i * 31)
        .toDF("k", "bv").dropDuplicates("k")
      val nSalts = sample(Gen.choose(1, 9), i * 7)
      val jt = if (i % 2 == 0) "inner" else "left"
      val plain = probe.join(build, Seq("k"), jt).select("k", "pv", "bv")
      val salt = Joins.salted(probe, build, Seq("k"), nSalts, jt)
        .select("k", "pv", "bv")
      assert(sorted(salt) == sorted(plain), s"seed $i nSalts $nSalts $jt")
    }
  }

  test("prop: range join equals the naive range predicate on random inputs") {
    (1 to 4).foreach { i =>
      val points = sample(Gen.listOfN(60,
        Gen.zip(Gen.choose(0L, 30L), Gen.choose(-200L, 200L))), i)
        .toDF("pid", "v")
      val ranges = sample(Gen.listOfN(12,
        for {
          lo <- Gen.choose(-150L, 150L)
          len <- Gen.choose(0L, 80L)
          rid <- Gen.choose(0L, 1000L)
        } yield (rid, lo, lo + len)), i * 13)
        .toDF("rid", "lo", "hi")
      val width = sample(Gen.choose(1L, 40L), i * 17)
      val naive = points.crossJoin(ranges)
        .filter(col("v") >= col("lo") && col("v") <= col("hi"))
        .select("rid", "pid", "v")
      val bucketed = Joins.rangeJoin(points, "v", ranges, "lo", "hi", width)
        .select("rid", "pid", "v")
      assert(sorted(bucketed) == sorted(naive), s"seed $i width $width")
    }
  }

  test("prop: topNPerGroup equals window rank on random scores") {
    (1 to 3).foreach { i =>
      val rows = sample(Gen.listOfN(150, for {
        g <- Gen.choose(0, 4)
        id <- Gen.choose(0L, 5000L)
        s <- Gen.choose(-100, 100)
      } yield (s"g$g", id, s.toDouble)), i)
        .toDF("g", "id", "score").dropDuplicates("g", "id")
      val n = sample(Gen.choose(1, 6), i * 11)
      val viaHeap = Rank.topNPerGroup(rows, Seq("g"), "id", "score", n)
      val w = Window.partitionBy(col("g")).orderBy(col("score").desc, col("id").asc)
      val viaWin = rows.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= n).select(col("g"), col("id"),
          col("score"), col("rank"))
      assert(sorted(viaHeap) == sorted(viaWin), s"seed $i n $n")
    }
  }

  test("prop: connected components equal a union-find reference") {
    // 8 seeds (widened when label-edge propagation landed): 25 random
    // edges over 40 vertices yield sparse forests, small cycles, and
    // short chains — the diameter mix where some seeds finish in 2
    // plain rounds and others cross into the label-edge branch at round 3
    (1 to 8).foreach { i =>
      val vs = (0L until 40L).toSeq
      val edges = sample(Gen.listOfN(25,
        Gen.zip(Gen.choose(0L, 39L), Gen.choose(0L, 39L))), i)
        .filter { case (a, b) => a != b }
        .map { case (a, b) => if (a < b) (a, b) else (b, a) }
      // union-find reference
      val parent = scala.collection.mutable.Map(vs.map(v => v -> v): _*)
      def find(v: Long): Long = {
        var r = v
        while (parent(r) != r) r = parent(r)
        r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = vs.map(v => v -> find(v)).toMap
      val got = Dedup.connectedComponents(
        edges.toDF("a", "b"), vs.toDF("id"), "id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"seed $i")
    }
  }

  test("prop: packSequences start offsets match a sequential reference") {
    (1 to 3).foreach { i =>
      val docs = sample(Gen.listOfN(60, for {
        part <- Gen.choose(0, 2)
        toks <- Gen.choose(1L, 120L)
      } yield (s"p$part", toks)), i)
        .zipWithIndex.map { case ((p, t), idx) => (p, idx.toLong, t) }
        .toDF("part", "doc_id", "toks")
      val budget = sample(Gen.choose(50L, 300L), i * 5)
      val got = Packing.packSequences(docs, Seq("part"), Seq("doc_id"),
        col("toks"), budget)
        .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
      val expected = docs.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1).iterator.flatMap { case (_, rows) =>
          var off = 0L
          rows.sortBy(_._2).map { case (_, id, t) =>
            val bin = off / budget
            off += t
            id -> bin
          }
        }.toMap
      assert(got == expected, s"seed $i budget $budget")
    }
  }

  test("prop: chunkDedup equals a sequential first-occurrence reference") {
    (1 to 4).foreach { i =>
      // small vocab + short docs → plenty of within-doc and cross-doc
      // duplicate chunks
      val docs = sample(Gen.listOfN(40,
        Gen.chooseNum(1, 12).flatMap(n =>
          Gen.listOfN(n, Gen.oneOf("a", "b", "c", "ab")).map(_.mkString(" ")))), i * 11)
        .zipWithIndex.map { case (t, id) => (id.toLong, t) }
      val ct = sample(Gen.choose(1, 3), i * 5)
      // reference: scan docs in id order, chunk sequentially, keep a
      // chunk iff its text was never seen before (corpus-wide)
      val seen = scala.collection.mutable.Set.empty[String]
      val expected = docs.flatMap { case (id, t) =>
        val kept = t.split(" ").grouped(ct).map(_.mkString(" "))
          .filter(c => seen.add(c)).toSeq
        if (kept.isEmpty) None
        else Some((id, kept.mkString(" "), kept.size.toLong))
      }.toSet
      val got = Dedup.chunkDedup(docs.toDF("doc_id", "text"), "doc_id",
        col("text"), ct)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got == expected, s"seed $i chunkTokens $ct")
    }
  }

  test("prop: spanCutDedup equals a sequential ownership reference on " +
      "random near-duplicated corpora") {
    // reference semantics, computed naively: a position is duplicated
    // when its n-shingle occurs in >= minDocs distinct docs; the owner
    // is the minimum (doc, pos); a token is cut iff covered by >= 1
    // duplicated position and by NO owned position
    def reference(docs: Seq[(Long, String)], n: Int, minDocs: Int)
        : Map[Long, (String, Long, Long)] = {
      val words = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
      val occ = for {
        (id, ws) <- words.toSeq if ws.size >= n
        p <- 1 to (ws.size - n + 1)
      } yield (ws.slice(p - 1, p + n - 1).mkString(" "), id, p)
      val hot = occ.groupBy(_._1)
        .filter(_._2.map(_._2).distinct.size >= minDocs)
      val owners = hot.map { case (sh, os) =>
        sh -> os.map(o => (o._2, o._3)).min
      }
      docs.map { case (id, _) =>
        val ws = words(id)
        val covered = Array.fill(ws.size + 1)(false)
        val owned = Array.fill(ws.size + 1)(false)
        for {
          p <- 1 to math.max(0, ws.size - n + 1)
          sh = ws.slice(p - 1, p + n - 1).mkString(" ")
          if hot.contains(sh)
          t <- p until (p + n)
        } {
          covered(t) = true
          if (owners(sh) == ((id, p))) owned(t) = true
        }
        val keep = (1 to ws.size).filter(t => !covered(t) || owned(t))
        id -> ((keep.map(t => ws(t - 1)).mkString(" "),
          keep.size.toLong, (ws.size - keep.size).toLong))
      }.toMap
    }
    (1 to 4).foreach { i =>
      // tiny vocab + mutation-heavy docs → real shared runs
      val docGen = for {
        len <- Gen.choose(3, 30)
        ws <- Gen.listOfN(len, Gen.choose(0, 6).map("w" + _))
      } yield ws.mkString(" ")
      val docs = sample(Gen.listOfN(14, docGen), i * 131)
        .zipWithIndex.map { case (t, j) => (j.toLong, t) }
      val n = sample(Gen.choose(2, 4), i * 17)
      val got = Dedup.spanCutDedup(docs.toDF("doc_id", "text"),
          "doc_id", col("text"), n = n, minDocs = 2)
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
      assert(got == reference(docs, n, 2), s"seed $i n $n")
    }
  }

  test("prop: spanCutAgainst equals a sequential reference-membership " +
      "cut on random corpora") {
    // reference semantics: a token of an INCOMING doc is cut iff it is
    // covered by an n-shingle occurrence whose shingle appears anywhere
    // in the reference corpus; reference docs never appear in the output
    def reference(inc: Seq[(Long, String)], ref: Seq[String], n: Int)
        : Map[Long, (String, Long, Long)] = {
      val refSh = (for {
        t <- ref
        ws = t.split(" ", -1).toSeq if ws.size >= n
        p <- 1 to (ws.size - n + 1)
      } yield ws.slice(p - 1, p + n - 1).mkString(" ")).toSet
      inc.map { case (id, t) =>
        val ws = t.split(" ", -1).toSeq
        val covered = Array.fill(ws.size + 1)(false)
        for {
          p <- 1 to math.max(0, ws.size - n + 1)
          if refSh.contains(ws.slice(p - 1, p + n - 1).mkString(" "))
          k <- p until (p + n)
        } covered(k) = true
        val keep = (1 to ws.size).filterNot(covered)
        id -> ((keep.map(k => ws(k - 1)).mkString(" "),
          keep.size.toLong, (ws.size - keep.size).toLong))
      }.toMap
    }
    (1 to 4).foreach { i =>
      val docGen = for {
        len <- Gen.choose(3, 30)
        ws <- Gen.listOfN(len, Gen.choose(0, 6).map("w" + _))
      } yield ws.mkString(" ")
      val inc = sample(Gen.listOfN(10, docGen), i * 977)
        .zipWithIndex.map { case (t, j) => (j.toLong, t) }
      val ref = sample(Gen.listOfN(6, docGen), i * 977 + 1)
      val n = sample(Gen.choose(2, 4), i * 13)
      val got = Dedup.spanCutAgainst(
          inc.toDF("doc_id", "text"),
          ref.zipWithIndex.map { case (t, j) => (1000L + j, t) }
            .toDF("doc_id", "text"),
          "doc_id", col("text"), n = n)
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
      assert(got == reference(inc, ref, n), s"seed $i n $n")
    }
  }
}
