package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Dedup

/** [[graft.functions.WinnowHashes]] / [[graft.ops.Dedup.winnowedOverlapPairs]]:
  * driver-side replication of the winnowing selection, the SIGMOD-03
  * guarantee (a shared span of ≥ k+w−1 words always yields a shared
  * fingerprint), edge windows, and the pair operator end-to-end. */
class WinnowSpec extends AnyFunSuite {

  import TestKit._
  import spark.implicits._

  private val K = 3
  private val W = 4

  /** Driver-side reference: positional gram hashes → window minima →
    * distinct, with the one-window-when-short edge. */
  private def refWinnow(text: String, k: Int, w: Int): Seq[Long] = {
    val words = text.split(" ", -1) // empty words are real words
    if (words.length < k) return Seq.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    val grams = (0 to words.length - k).map { i =>
      val hex = md.digest(words.slice(i, i + k).mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val mins =
      if (grams.size <= w) Seq(grams.min)
      else (0 to grams.size - w).map(j => grams.slice(j, j + w).min)
    mins.distinct
  }

  private def winnowDf(rows: (Long, String)*) =
    Dedup.winnowedFingerprints(rows.toSeq.toDF("doc_id", "text"),
      "doc_id", col("text"), K, W)

  test("winnow: expression == driver-side reference on seeded random docs") {
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g")
    val rnd = new scala.util.Random(17)
    val docs = (1L to 60L).map { id =>
      id -> Seq.fill(rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val got = winnowDf(docs: _*).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .map { case (id, fs) => id -> fs.map(_._2).toSet }
    val expect = docs.map { case (id, t) => id -> refWinnow(t, K, W).toSet }
      .filter(_._2.nonEmpty).toMap
    assert(got == expect)
    // nfp column is the per-doc distinct fingerprint count
    val nfp = winnowDf(docs: _*).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    expect.foreach { case (id, fs) => assert(nfp(id) == fs.size.toLong, s"doc $id") }
  }

  test("winnow edges: under k words -> absent; grams <= w -> exactly one fingerprint") {
    val out = winnowDf(1L -> "x y", 2L -> "x y z", 3L -> "a b c d e f")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(!out.map(_._1).contains(1L)) // 2 words < k
    assert(out.count(_._1 == 2L) == 1)  // 1 gram, one whole-list window
    assert(out.count(_._1 == 3L) == 1)  // 4 grams = w, still one window
  }

  test("property: a shared span of k+w-1 words always yields a shared fingerprint (6 seeds)") {
    val vocab = Vector("p", "q", "r", "s", "t", "u", "v", "w2", "x", "y", "z")
    for (seed <- 51 to 56) {
      val rnd = new scala.util.Random(seed)
      def words(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.size)))
      val span = words(K + W - 1) // the guaranteed-detection length
      val docA = (words(5 + rnd.nextInt(10)) ++ span ++ words(rnd.nextInt(8))).mkString(" ")
      val docB = (words(rnd.nextInt(12)) ++ span ++ words(3 + rnd.nextInt(6))).mkString(" ")
      val a = refWinnow(docA, K, W).toSet
      val b = refWinnow(docB, K, W).toSet
      assert((a & b).nonEmpty, s"seed $seed: winnowing guarantee violated")
      // and the Spark expression agrees with the reference on both docs
      val got = winnowDf(1L -> docA, 2L -> docB).collect()
        .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
        .map { case (id, fs) => id -> fs.map(_._2).toSet }
      assert(got(1L) == a && got(2L) == b, s"seed $seed")
    }
  }

  test("winnow: multi-byte UTF-8 tokens hash and window like the reference (byte spans are split-safe)") {
    val docs = Seq(
      1L -> "naïve café 東京 привет mañana über",
      2L -> "東京 привет mañana x1 x2 x3")
    val got = winnowDf(docs: _*).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .map { case (id, fs) => id -> fs.map(_._2).toSet }
    val expect = docs.map { case (id, t) => id -> refWinnow(t, K, W).toSet }.toMap
    assert(got == expect)
    // the shared 3-token run is k+w-1 short of the guarantee length,
    // but the reference decides — operator and reference agree above
  }

  test("winnowedOverlapPairs: containment hits 1.0 for an embedded document; maxDf drops hot fingerprints") {
    val shared = "m1 m2 m3 m4 m5 m6 m7 m8"
    val pairs = Dedup.winnowedOverlapPairs(
      Seq(1L -> s"$shared tail1 tail2 tail3 tail4 tail5 tail6",
          2L -> shared, // fully embedded in doc 1
          3L -> "zz1 zz2 zz3 zz4 zz5 zz6 zz7").toDF("doc_id", "text"),
      "doc_id", col("text"), K, W, minShared = 1, maxDf = 100)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    assert(pairs.keySet == Set((1L, 2L)))
    assert(pairs((1L, 2L)) == 1.0) // every doc-2 fingerprint is in doc 1
    // a fingerprint shared by every doc is boilerplate: maxDf = 2 on a
    // 3-way duplicate kills the only index entries
    val hot = Dedup.winnowedOverlapPairs(
      Seq(1L -> shared, 2L -> shared, 3L -> shared).toDF("doc_id", "text"),
      "doc_id", col("text"), K, W, minShared = 1, maxDf = 2)
    assert(hot.count() == 0)
  }

  test("sourceOverlapMatrix: exact pairwise shingle Jaccard, per-source distinct, null text skipped") {
    // srcA docs: "a b c d" → 3-grams {abc, bcd}; "a b c" → {abc} (dup
    // of the first doc's — per-source distinct keeps it once)
    // srcB: "b c d e" → {bcd, cde}; srcC: "x y z" → {xyz}; null text
    val df = Seq(
      ("A", "a b c d"), ("A", "a b c"), ("B", "b c d e"),
      ("C", "x y z"), ("C", null))
      .toDF("source", "text")
    val got = Dedup.sourceOverlapMatrix(df, "source", col("text"), n = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // only A-B share anything: {abc,bcd} ∩ {bcd,cde} = {bcd} → J = 1/3
    assert(got.keySet == Set(("A", "B")))
    assert(got(("A", "B")) == ((2L, 2L, 1L, 0.333333)))
  }
}
