package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Retrieval

/** [[graft.ops.Retrieval.bm25TopK]]: hand-computed scores on a tiny
  * corpus, then exact agreement with a driver-side reference
  * implementation (rational IDF, 6-dp HALF_UP per-term rounding, exact
  * decimal sums, (score desc, id asc) ranking) over seeded random
  * corpora — the same replication discipline as the DuckDB oracle. */
class RetrievalSpec extends AnyFunSuite {

  import TestKit._
  import spark.implicits._

  private def run(corpus: Seq[(Long, String)], queries: Seq[(Long, String)],
      k: Int): Seq[(Long, Long, Double, Long)] =
    Retrieval.bm25TopK(
      corpus.toDF("doc_id", "text"), "doc_id", col("text"),
      queries.toDF("query_id", "qtext"), "query_id", col("qtext"), k)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSeq.sortBy(t => (t._1, t._4))

  /** Driver-side replication of the operator's exact arithmetic. */
  private def reference(corpus: Seq[(Long, String)],
      queries: Seq[(Long, String)], k: Int): Seq[(Long, Long, Double, Long)] = {
    val toks = corpus.map { case (id, t) =>
      id -> t.split(" ", -1).filter(_.nonEmpty).toSeq
    }.toMap
    val dl = toks.map { case (id, ts) => id -> ts.size.toLong }
    val n = dl.size.toDouble
    val len = dl.values.sum.toDouble
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double, Long)]
    for ((qid, qt) <- queries) {
      val terms = qt.split(" ", -1).filter(_.nonEmpty).distinct
      val scored = corpus.flatMap { case (id, _) =>
        val tfs = terms.flatMap { t =>
          val tf = toks(id).count(_ == t)
          if (tf > 0) Some(t -> tf.toLong) else None
        }
        if (tfs.isEmpty) None
        else {
          val score = tfs.map { case (t, tf) =>
            val df = corpus.count { case (i2, _) => toks(i2).contains(t) }.toDouble
            val idf = (n - df + 0.5) / (df + 0.5)
            val rel = dl(id).toDouble * n / len
            val sat = tf.toDouble * 2.2 / (tf.toDouble + 1.2 * (0.25 + 0.75 * rel))
            BigDecimal(idf * sat).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          }.sum
          Some(id -> score.toDouble)
        }
      }
      scored.sortBy { case (id, s) => (-s, id) }.take(k).zipWithIndex.foreach {
        case ((id, s), i) => out += ((qid, id, s, i + 1L))
      }
    }
    out.toSeq.sortBy(t => (t._1, t._4))
  }

  test("bm25TopK: hand-checked tiny corpus — tf saturation, idf, length norm") {
    // 3 docs, avgdl = (2+4+2)/3; "cat" df=2, "dog" df=1
    val corpus = Seq(1L -> "cat dog", 2L -> "cat cat cat mouse", 3L -> "bird mouse")
    val got = run(corpus, Seq(10L -> "cat dog"), k = 3)
    // doc 3 has no query term: exactly 2 hits
    assert(got.map(_._2) == Seq(1L, 2L))
    // doc 1 (both terms, short) must out-rank doc 2 (one term, long):
    // rational idf of dog = (3-1+0.5)/(1+0.5) = 5/3 vs cat = 0.6
    val expect = reference(corpus, Seq(10L -> "cat dog"), k = 3)
    assert(got == expect)
    assert(got.head._2 == 1L && got.head._4 == 1L)
  }

  test("bm25TopK: absent query vocabulary yields zero rows, not an error") {
    assert(run(Seq(1L -> "a b"), Seq(5L -> "zz yy"), k = 3).isEmpty)
  }

  test("property: operator == driver-side reference on seeded random corpora (4 seeds)") {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    for (seed <- 91 to 94) {
      val rnd = new scala.util.Random(seed)
      val corpus = (1L to 40L).map { id =>
        id -> Seq.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val queries = (100L to 102L).map { qid =>
        qid -> Seq.fill(1 + rnd.nextInt(3))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      assert(run(corpus, queries, k = 5) == reference(corpus, queries, k = 5),
        s"seed $seed")
    }
  }

  test("phraseSearch: aligned positions only, overlaps count, chain order-free") {
    val docs = Seq(
      (1L, "x table hash y table hash"),   // two non-overlapping occurrences
      (2L, "table y hash"),                // terms present, never adjacent
      (3L, "hash table"),                  // reversed order is no match
      (4L, "table hash"),                  // exact doc
      (5L, "zzz")).toDF("doc_id", "text")
    val got = Retrieval.phraseSearch(docs, "doc_id", col("text"),
        Seq("table", "hash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 2L, 4L -> 1L))
    // overlapping occurrences all count: "a a a" holds two "a a"s
    val ov = Retrieval.phraseSearch(
        Seq((1L, "a a a")).toDF("doc_id", "text"), "doc_id", col("text"),
        Seq("a", "a"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ov === Map(1L -> 2L))
    // three-term phrase: only the full contiguous run matches
    val tri = Retrieval.phraseSearch(
        Seq((1L, "p q r"), (2L, "p q x r"), (3L, "w p q r w p q r"))
          .toDF("doc_id", "text"), "doc_id", col("text"), Seq("p", "q", "r"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tri === Map(1L -> 1L, 3L -> 2L))
  }
}
