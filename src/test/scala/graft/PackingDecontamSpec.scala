package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Decontam, Packing}

/** Sequence packing must reproduce concat-and-cut block assignment;
  * decontamination must measure exact shingle overlap against the
  * benchmark set and drop only docs at/over the threshold. */
class PackingDecontamSpec extends AnyFunSuite {

  import TestKit._
  import spark.implicits._

  test("packSequences: start-offset blocking, independent per group") {
    val docs = Seq(
      // lang a: tokens 60,50,30,70 → starts 0,60,110,140 → seqs 0,0,1,1 @100
      ("a", 1L, 60L), ("a", 2L, 50L), ("a", 3L, 30L), ("a", 4L, 70L),
      // lang b restarts at 0: tokens 120,10 → starts 0,120 → seqs 0,1
      ("b", 5L, 120L), ("b", 6L, 10L))
      .toDF("lang", "doc_id", "toks")
    val out = Packing.packSequences(docs, Seq("lang"), Seq("doc_id"),
      col("toks"), budget = 100)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L,
      5L -> 0L, 6L -> 1L))
  }

  test("packSequences rejects a non-positive budget") {
    val docs = Seq(("a", 1L, 5L)).toDF("lang", "doc_id", "toks")
    intercept[IllegalArgumentException] {
      Packing.packSequences(docs, Seq("lang"), Seq("doc_id"), col("toks"), 0)
    }
  }

  private def corpus = Seq(
    (10L, "alpha beta gamma delta epsilon"), // = benchmark doc verbatim
    (11L, "alpha beta gamma something else entirely here"), // partial
    (12L, "totally different words nothing shared at all"), // disjoint
    (13L, "x y")) // under n words → no shingles, absent
    .toDF("doc_id", "text")
  private def benchmark = Seq(
    (1L, "alpha beta gamma delta epsilon"))
    .toDF("doc_id", "text")

  test("overlapProfile measures exact benchmark shingle overlap") {
    val prof = Decontam.overlapProfile(corpus, benchmark, "doc_id",
      col("text"), n = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(prof(10L) == ((3L, 3L, 1.0))) // all 3 shingles contaminated
    assert(prof(11L)._1 == 5L && prof(11L)._2 == 1L) // "alpha beta gamma" only
    assert(prof(12L) == ((5L, 0L, 0.0))) // 7 words → 5 trigrams
    assert(!prof.contains(13L)) // no shingles → absent
  }

  test("dropContaminated keeps clean and shingle-less docs") {
    val kept = Decontam.dropContaminated(corpus, benchmark, "doc_id",
      col("text"), n = 3, maxFrac = 0.5)
      .collect().map(_.getLong(0)).sorted
    // 10 dropped (1.0 ≥ 0.5); 11 kept (0.2); 12 kept; 13 kept (no shingles)
    assert(kept.toSeq == Seq(11L, 12L, 13L))
  }
}
