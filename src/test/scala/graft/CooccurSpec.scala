package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TextAnalysis

/** [[graft.ops.TextAnalysis.cooccurTopK]]: hand-computed collocations
  * and exact agreement with a driver-side reference (windowed unordered
  * pairs, rational PMI, count-then-hash ranking) on seeded corpora. */
class CooccurSpec extends AnyFunSuite {

  import TestKit._
  import spark.implicits._

  private def run(texts: Seq[String], window: Int, k: Int, minCount: Long) =
    TextAnalysis.cooccurTopK(texts.toDF("text"), col("text"),
      window, k, minCount)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))
      .toSeq.sortBy(_._5)

  private def hash60(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  private def reference(texts: Seq[String], window: Int, k: Int,
      minCount: Long): Seq[(String, String, Long, Double, Long)] = {
    val docs = texts.map(_.split(" ", -1).filter(_.nonEmpty).toSeq)
    val pairCnt = scala.collection.mutable.Map.empty[(String, String), Long]
    for (ws <- docs; i <- ws.indices; j <- (i + 1) to math.min(i + window, ws.size - 1)) {
      val p = if (ws(i) <= ws(j)) (ws(i), ws(j)) else (ws(j), ws(i))
      pairCnt(p) = pairCnt.getOrElse(p, 0L) + 1L
    }
    val uni = docs.flatten.groupBy(identity).map { case (t, o) => t -> o.size.toLong }
    val nn = docs.map(_.size).sum.toDouble
    pairCnt.toSeq.filter(_._2 >= minCount)
      .map { case ((a, b), nab) =>
        val pmi = BigDecimal(nab.toDouble * nn / (uni(a).toDouble * uni(b).toDouble))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (a, b, nab, pmi, hash60(s"$a $b"))
      }
      .sortBy { case (_, _, nab, _, h) => (-nab, h) }
      .take(k).zipWithIndex
      .map { case ((a, b, nab, pmi, _), i) => (a, b, nab, pmi, i + 1L) }
  }

  test("cooccurTopK: hand-checked window, unordered pairs, rational PMI") {
    // "x y x z": window 2 pairs — (x,y),(x,x),(y,x),(y,z),(x,z)
    val got = run(Seq("x y x z", "x y x z"), window = 2, k = 10, minCount = 2)
    val byPair = got.map(t => (t._1, t._2) -> (t._3, t._4)).toMap
    assert(byPair(("x", "y"))._1 == 4L) // (x,y)+(y,x) per doc, 2 docs
    assert(byPair(("x", "x"))._1 == 2L)
    assert(byPair(("x", "z"))._1 == 2L)
    assert(byPair(("y", "z"))._1 == 2L)
    // pmi(x,x): n_ab·N/(n_x·n_x) = 2·8/16 = 1.0
    assert(byPair(("x", "x"))._2 == 1.0)
    assert(got == reference(Seq("x y x z", "x y x z"), 2, 10, 2))
  }

  test("cooccurTopK: minCount prunes, short/empty docs contribute nothing") {
    val got = run(Seq("a b", "a b", "c", ""), window = 3, k = 5, minCount = 2)
    assert(got.map(t => (t._1, t._2)) == Seq(("a", "b"))) // "c" pairs: none
    assert(got.head._3 == 2L)
  }

  test("cooccurTopK: multi-byte UTF-8 tokens pair and order like the reference (binary collation)") {
    val texts = Seq("café 東京 café über", "café 東京 naïve 東京",
      "東京 café 東京 café")
    assert(run(texts, window = 2, k = 10, minCount = 2) ==
      reference(texts, 2, 10, 2))
  }

  test("property: operator == driver-side reference on seeded corpora (4 seeds)") {
    val vocab = Vector("t0", "t1", "t2", "t3", "t4", "t5", "t6", "t7")
    for (seed <- 71 to 74) {
      val rnd = new scala.util.Random(seed)
      val texts = Seq.fill(30)(
        Seq.fill(rnd.nextInt(15))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      val got = run(texts, window = 3, k = 8, minCount = 2)
      assert(got == reference(texts, 3, 8, 2), s"seed $seed")
    }
  }
}
