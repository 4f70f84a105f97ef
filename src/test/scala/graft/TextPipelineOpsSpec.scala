package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{PiiScrub, Repetition, Sampling}

/** Round-13 pipeline operators: repetition quality signals (Gopher-style
  * duplicate-token / top-bigram fractions), PII scrub, and temperature
  * resampling — hand-computed expectations plus the determinism and
  * bound properties each operator's scaladoc promises. */
class TextPipelineOpsSpec extends AnyFunSuite {

  import TestKit._
  import spark.implicits._

  // ---------------------------------------------------------------- //
  //  Repetition                                                       //
  // ---------------------------------------------------------------- //

  private def docs(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))

  test("dupTokenFrac is 1 - distinct/total at 6 dp") {
    val got = docs(1L -> "a a b").select(
      Repetition.dupTokenFrac(col("text"))).head.getDouble(0)
    assert(got == 0.333333) // 1 - 2/3, HALF_UP at 6 dp
    val uniq = docs(2L -> "p q r").select(
      Repetition.dupTokenFrac(col("text"))).head.getDouble(0)
    assert(uniq == 0.0)
  }

  test("bigramProfile: hand-computed top bigram, count, and char fraction") {
    // "a a b a b c" (11 chars): bigrams a-a, a-b, b-a, a-b, b-c → top
    // ("a b", 2); char frac = 2·3/11; dup frac = 1 − 3/6 = 0.5
    val out = Repetition.bigramProfile(
      docs(1L -> "a a b a b c"), "doc_id", "text", "n_chars").head
    assert(out.getAs[Double]("dup_token_frac") == 0.5)
    assert(out.getAs[String]("top_bigram") == "a b")
    assert(out.getAs[Long]("top_bigram_cnt") == 2L)
    assert(out.getAs[Double]("top_bigram_char_frac") == 0.545455)
  }

  test("bigramProfile ties break to the lexicographically largest bigram") {
    // all bigrams unique → count tie → struct max picks "c d"
    val out = Repetition.bigramProfile(
      docs(1L -> "a b c d"), "doc_id", "text", "n_chars").head
    assert(out.getAs[String]("top_bigram") == "c d")
    assert(out.getAs[Long]("top_bigram_cnt") == 1L)
  }

  test("bigramProfile plans hash-based aggregation only (no SortAggregate)") {
    // the argmax must run as ObjectHashAggregate (ArgExtremum);
    // native max over the packed string would silently fall back to a
    // partition-wide SortAggregate
    val plan = Repetition.bigramProfile(
      docs(1L -> "a a b a b c", 2L -> "x y x y"), "doc_id", "text", "n_chars")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortAggregate"), s"sort-based aggregate in:\n$plan")
    assert(plan.contains("ObjectHashAggregate"), s"no object hash agg in:\n$plan")
  }

  test("bigramProfile drops documents with fewer than two tokens") {
    val out = Repetition.bigramProfile(
      docs(1L -> "solo", 2L -> "two tokens"), "doc_id", "text", "n_chars")
    assert(out.select("doc_id").as[Long].collect().toSeq == Seq(2L))
  }

  // ---------------------------------------------------------------- //
  //  PiiScrub                                                         //
  // ---------------------------------------------------------------- //

  test("scrub redacts emails and IPs; email wins a dotted-quad domain") {
    val t = Seq(
      "mail a.b@x.co and 10.1.2.3 done",
      // dotted quad INSIDE a matching email domain: the email pass must
      // consume it whole — ip-first would tear it into u@<IP>.com
      "u@10.1.2.3.com stays one tag",
      "no pii here").toDF("text")
    val got = t.select(PiiScrub.scrub(col("text"))).as[String].collect().toSeq
    assert(got == Seq(
      "mail <EMAIL> and <IP> done",
      "<EMAIL> stays one tag",
      "no pii here"))
  }

  test("report counts match the scrub semantics (no double counting)") {
    val t = Seq("a.b@x.co then 10.1.2.3 and u@10.1.2.3.com end").toDF("text")
    val row = t.select(
      PiiScrub.report(col("text")).map { case (n, c) => c.as(n) }: _*).head
    assert(row.getAs[Long]("n_emails") == 2L)
    assert(row.getAs[Long]("n_ips") == 1L) // the quad in the domain doesn't count
    assert(row.getAs[Long]("scrubbed_len") ==
      "<EMAIL> then <IP> and <EMAIL> end".length.toLong)
  }

  test("an @ without an alpha TLD is not an email; its quad is an IP") {
    val row = Seq("ping u@1.2.3.4 raw").toDF("text").select(
      PiiScrub.report(col("text")).map { case (n, c) => c.as(n) }: _*).head
    assert(row.getAs[Long]("n_emails") == 0L)
    assert(row.getAs[Long]("n_ips") == 1L)
  }

  // ---------------------------------------------------------------- //
  //  tokenRarity                                                      //
  // ---------------------------------------------------------------- //

  test("tokenRarity: hand-computed corpus frequencies and rare fractions") {
    // corpus tf: a→3, b→2, z→1; rareBelow=2 → only z is rare
    val in = Seq(1L -> "a a b", 2L -> "a b z").toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.tokenRarity(in, "doc_id", col("text"),
      rareBelow = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out(1L) == ((3L, 0L, 0.0, round6((3 + 3 + 2) / 3.0))))
    assert(out(2L) == ((3L, 1L, round6(1 / 3.0), round6((3 + 2 + 1) / 3.0))))
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  // ---------------------------------------------------------------- //
  //  chunkDedup                                                       //
  // ---------------------------------------------------------------- //

  test("chunkDedup keeps the first corpus-wide occurrence of each chunk") {
    val in = Seq(1L -> "a b c d", 2L -> "a b x y").toDF("doc_id", "text")
    val out = graft.ops.Dedup.chunkDedup(in, "doc_id", col("text"), 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) == (("a b c d", 2L))) // first occurrence: untouched
    assert(out(2L) == (("x y", 1L)))     // shared "a b" chunk dropped
  }

  test("chunkDedup drops within-document repeats and fully-duplicate docs") {
    val in = Seq(1L -> "a b a b c", 2L -> "a b a b").toDF("doc_id", "text")
    // doc 1 chunks: "a b"(0) "a b"(2... pos1) "c"(pos2) → "a b c";
    // doc 2 is entirely chunks already seen → vanishes
    val out = graft.ops.Dedup.chunkDedup(in, "doc_id", col("text"), 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a b c"))
  }

  test("chunkDedup reassembles >10 chunks in numeric (not string) position order") {
    val words = (0 until 24).map(i => s"w$i").mkString(" ") // 12 distinct 2-token chunks
    val in = Seq(7L -> words).toDF("doc_id", "text")
    val out = graft.ops.Dedup.chunkDedup(in, "doc_id", col("text"), 2)
      .head.getString(1)
    assert(out == words) // all chunks unique → text round-trips in order
  }

  // ---------------------------------------------------------------- //
  //  temperatureResample                                              //
  // ---------------------------------------------------------------- //

  private def skewed = (0 until 400).map(i => ("big", i.toLong))
    .++((1000 until 1100).map(i => ("small", i.toLong)))
    .toDF("g", "id")

  test("temperatureResample keeps the smallest group whole and flattens the rest") {
    val kept = Sampling.temperatureResample(skewed, "g", "id", alpha = 0.5,
      seed = "t")
    val byG = kept.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(byG("small") == 100L) // rate (100/100)^0.5 = 1
    // big: rate sqrt(100/400) = 0.5 → expect ~200; hash split tolerance
    assert(math.abs(byG("big") - 200L) <= 30L, s"big kept ${byG("big")}")
  }

  test("temperatureResample is a pure function of (seed, id)") {
    val a = Sampling.temperatureResample(skewed, "g", "id", 0.5, "t")
      .select("id").as[Long].collect().toSet
    val b = Sampling.temperatureResample(skewed.repartition(13), "g", "id", 0.5, "t")
      .select("id").as[Long].collect().toSet
    assert(a == b)
    val c = Sampling.temperatureResample(skewed, "g", "id", 0.5, "other")
      .select("id").as[Long].collect().toSet
    assert(a != c) // fresh seed → fresh membership (overwhelming probability)
    // output rows are input rows (no duplication, no mutation)
    assert(a.subsetOf((0L until 400L).toSet ++ (1000L until 1100L).toSet))
  }

  test("shuffleShards is a stable permutation: every row exactly once, dense per-shard positions") {
    val docs = (0L until 500L).toDF("doc_id")
    val out = Sampling.shuffleShards(docs, "doc_id", nShards = 8, seed = "s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._1).toSet == (0L until 500L).toSet) // a permutation
    // positions are dense 1..n within each shard
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.size).toSeq)
    }
    // stable under repartitioning; new seed is a different permutation
    val again = Sampling.shuffleShards(docs.repartition(13), "doc_id", 8, "s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    val other = Sampling.shuffleShards(docs, "doc_id", 8, "s2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.sortBy(_._1).toSeq != other.sortBy(_._1).toSeq)
  }

  test("shuffleShards breaks id-order locality (order decorrelated from shard)") {
    val docs = (0L until 400L).toDF("doc_id")
    val byShard = Sampling.shuffleShards(docs, "doc_id", 4, "s")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(0)))
      .groupBy(_._1)
    // within a shard, consecutive positions should NOT be consecutive
    // ids: count adjacent pairs whose ids differ by exactly 1 — a
    // curation-order-preserving "shuffle" would make most of them 1
    val adjacent = byShard.values.map { rows =>
      val ids = rows.sortBy(_._2).map(_._3)
      ids.sliding(2).count(p => math.abs(p(1) - p(0)) == 1)
    }.sum
    assert(adjacent < 20, s"$adjacent consecutive-id adjacencies — order not shuffled")
  }

  test("temperatureResample at alpha=1 is the identity mix") {
    val kept = Sampling.temperatureResample(skewed, "g", "id", alpha = 1.0,
      seed = "t")
    assert(kept.count() == 500L)
  }

  // ---------------------------------------------------------------- //
  //  boilerplateSpans                                                 //
  // ---------------------------------------------------------------- //

  private def bp(rows: (Long, String)*)(spanTokens: Int, minDocs: Int) =
    graft.ops.Dedup.boilerplateSpans(rows.toSeq.toDF("doc_id", "text"),
      "doc_id", col("text"), spanTokens, minDocs)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap

  test("boilerplateSpans drops EVERY occurrence past the doc-frequency bar") {
    // "x" is in 3 docs → boilerplate; unlike chunkDedup, the FIRST
    // occurrence (doc 1) is dropped too
    val out = bp(1L -> "x a b", 2L -> "x c", 3L -> "x d")(1, 3)
    assert(out(1L) == (("a b", 2L, 1L)))
    assert(out(2L) == (("c", 1L, 1L)))
    assert(out(3L) == (("d", 1L, 1L)))
  }

  test("boilerplateSpans counts DISTINCT documents, not occurrences") {
    // "y" occurs 3 times but in one doc → df=1, kept whole
    val out = bp(1L -> "y y y", 2L -> "z")(1, 2)
    assert(out(1L) == (("y y y", 3L, 0L)))
    assert(out(2L) == (("z", 1L, 0L)))
  }

  test("a fully-boilerplate document survives with empty text") {
    val out = bp(1L -> "q", 2L -> "q")(1, 2)
    assert(out(1L) == (("", 0L, 1L)))
    assert(out(2L) == (("", 0L, 1L)))
  }

  test("boilerplateSpans reassembles around a dropped middle span in order") {
    val out = bp(1L -> "a b H H c d", 2L -> "H H", 3L -> "H H")(2, 2)
    assert(out(1L) == (("a b c d", 2L, 1L)))
    assert(out(2L) == (("", 0L, 1L)))
    assert(out(3L) == (("", 0L, 1L)))
  }

  // ---------------------------------------------------------------- //
  //  duplicatedSpans                                                  //
  // ---------------------------------------------------------------- //

  private def spans(rows: (Long, String)*)(n: Int, minDocs: Int) =
    graft.ops.Dedup.duplicatedSpans(rows.toSeq.toDF("doc_id", "text"),
      "doc_id", col("text"), n, minDocs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
      .toSeq.sortBy(t => (t._1, t._2))

  test("duplicatedSpans: one mutated token splits a shared run into " +
      "two maximal spans with exact boundaries") {
    val a = (1 to 20).map("t" + _).mkString(" ")
    val b = (1 to 20).map(i => if (i == 10) "zz" else "t" + i).mkString(" ")
    val got = spans(1L -> a, 2L -> b)(n = 8, minDocs = 2)
    // 8-windows at positions 1..13; windows covering position 10
    // (p in 3..10) differ between the docs → duplicated positions are
    // {1,2} and {11,12,13} in BOTH docs: spans [1..9] and [11..20]
    def tok(lo: Int, hi: Int, doc: Long) =
      (lo to hi).map(i => if (i == 10 && doc == 2L) "zz" else "t" + i)
        .mkString(" ")
    assert(got === Seq(
      (1L, 1L, 9L, 9L, tok(1, 9, 1L)),
      (1L, 11L, 20L, 10L, tok(11, 20, 1L)),
      (2L, 1L, 9L, 9L, tok(1, 9, 2L)),
      (2L, 11L, 20L, 10L, tok(11, 20, 2L))))
  }

  test("duplicatedSpans: overlapping spans via DIFFERENT partner runs " +
      "merge into one disjoint region (interval union)") {
    // doc 1 = t1..t20; doc 2 carries t1..t8 and t3..t10 as separate
    // runs (an 'x' between them), so doc 1's duplicated start positions
    // are {1, 3} — position 2 is NOT duplicated, yet the two spans
    // overlap by 6 tokens. Interval union reports ONE region [1, 10].
    val t = (1 to 20).map("t" + _)
    val a = t.mkString(" ")
    val b = (t.take(8) ++ Seq("x") ++ t.slice(2, 10)).mkString(" ")
    val got = spans(1L -> a, 2L -> b)(n = 8, minDocs = 2)
    assert(got.filter(_._1 == 1L) ===
      Seq((1L, 1L, 10L, 10L, t.take(10).mkString(" "))))
    // doc 2's duplicated starts are {1, 10}: gap 9 > n → two regions
    assert(got.filter(_._1 == 2L) === Seq(
      (2L, 1L, 8L, 8L, t.take(8).mkString(" ")),
      (2L, 10L, 17L, 8L, t.slice(2, 10).mkString(" "))))
  }

  test("duplicatedSpans: identical docs report one full-length span each") {
    val t = (1 to 12).map("w" + _).mkString(" ")
    val got = spans(1L -> t, 2L -> t)(n = 8, minDocs = 2)
    assert(got === Seq((1L, 1L, 12L, 12L, t), (2L, 1L, 12L, 12L, t)))
  }

  test("duplicatedSpans: unique and too-short docs yield nothing") {
    val got = spans(
      1L -> (1 to 12).map("u" + _).mkString(" "),  // unique content
      2L -> "a b c",                               // shorter than n
      3L -> "a b c")(n = 8, minDocs = 2)
    assert(got.isEmpty)
  }

  test("duplicatedSpans: minDocs counts DISTINCT documents, not occurrences") {
    // the run repeats TWICE inside doc 1 but exists in no other doc
    val run = (1 to 8).map("r" + _).mkString(" ")
    val got = spans(1L -> s"$run x y z $run", 2L -> "p q")(n = 8, minDocs = 2)
    assert(got.isEmpty)
  }

  // ---------------------------------------------------------------- //
  //  spanCutDedup                                                     //
  // ---------------------------------------------------------------- //

  private def cut(rows: (Long, String)*)(n: Int, minDocs: Int) =
    graft.ops.Dedup.spanCutDedup(rows.toSeq.toDF("doc_id", "text"),
      "doc_id", col("text"), n, minDocs)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("spanCutDedup: exact duplicate keeps the first occurrence whole, " +
      "cuts the second to empty") {
    val t = (1 to 20).map("t" + _).mkString(" ")
    val got = cut(1L -> t, 2L -> t)(n = 8, minDocs = 2)
    assert(got(1L) === ((t, 20L, 0L)))
    assert(got(2L) === (("", 0L, 20L)))
  }

  test("spanCutDedup: shared prefix cut from the later doc only; unique " +
      "tail survives; untouched docs pass through") {
    // docs share tokens 1..10 (positions 1..3 duplicated); doc 2's tail
    // differs. doc 2 loses exactly tokens 1..10, keeps its tail.
    val shared = (1 to 10).map("s" + _)
    val a = (shared ++ (1 to 10).map("a" + _)).mkString(" ")
    val b = (shared ++ (1 to 10).map("b" + _)).mkString(" ")
    val c = (1 to 12).map("c" + _).mkString(" ")
    val got = cut(1L -> a, 2L -> b, 3L -> c)(n = 8, minDocs = 2)
    assert(got(1L) === ((a, 20L, 0L)))
    assert(got(2L) ===
      (((1 to 10).map("b" + _).mkString(" "), 10L, 10L)))
    assert(got(3L) === ((c, 12L, 0L)))
  }

  test("spanCutDedup: a within-document repeat of a duplicated run keeps " +
      "only the corpus-first copy") {
    val run = (1 to 8).map("r" + _).mkString(" ")
    // doc 1 carries the run twice, doc 2 once: the first copy in doc 1
    // owns; doc 1's second copy and doc 2's copy are cut
    val got = cut(1L -> s"$run x y z $run", 2L -> run)(n = 8, minDocs = 2)
    assert(got(1L) === ((s"$run x y z", 11L, 8L)))
    assert(got(2L) === (("", 0L, 8L)))
  }

  test("spanCutAgainst: incoming tokens covered by reference shingles are " +
      "cut; within-batch duplicates are NOT (the documented composition)") {
    val shared = (1 to 10).map("s" + _)
    val ref = Seq(0L -> shared.mkString(" "))
    val incA = (shared ++ (1 to 10).map("a" + _)).mkString(" ")
    val dup = (1 to 12).map("d" + _).mkString(" ")
    val got = graft.ops.Dedup.spanCutAgainst(
      Seq(1L -> incA, 2L -> dup, 3L -> dup).toSeq.toDF("doc_id", "text"),
      ref.toDF("doc_id", "text"), "doc_id", col("text"), n = 8)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    // doc 1 loses exactly the reference-covered prefix, keeps its tail
    assert(got(1L) === (((1 to 10).map("a" + _).mkString(" "), 10L, 10L)))
    // docs 2/3 duplicate each other but not the reference: untouched
    assert(got(2L) === ((dup, 12L, 0L)))
    assert(got(3L) === ((dup, 12L, 0L)))
    // reference docs never appear in the output
    assert(!got.contains(0L))
  }

  test("spanCutAgainst: an incoming doc fully inside the reference is " +
      "cut to empty; short docs pass through") {
    val t = (1 to 20).map("t" + _).mkString(" ")
    val got = graft.ops.Dedup.spanCutAgainst(
      Seq(1L -> t, 2L -> "a b c").toDF("doc_id", "text"),
      Seq(0L -> t).toDF("doc_id", "text"), "doc_id", col("text"), n = 8)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(1L) === (("", 0L, 20L)))
    assert(got(2L) === (("a b c", 3L, 0L)))
  }

  test("spanCutAgainstIndex over spanIndexKeys equals spanCutAgainst, " +
      "including through a persisted bucketed index") {
    val shared = (1 to 10).map("s" + _)
    val ref = Seq(0L -> shared.mkString(" "),
      5L -> (1 to 15).map("r" + _).mkString(" ")).toDF("doc_id", "text")
    val inc = Seq(
      1L -> (shared ++ (1 to 10).map("a" + _)).mkString(" "),
      2L -> (1 to 12).map("d" + _).mkString(" "),
      3L -> ((1 to 15).map("r" + _) ++ Seq("tail1", "tail2")).mkString(" "))
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val direct = rows(graft.ops.Dedup.spanCutAgainst(
      inc, ref, "doc_id", col("text"), n = 8))
    // in-memory index
    val viaKeys = rows(graft.ops.Dedup.spanCutAgainstIndex(
      inc, graft.ops.Dedup.spanIndexKeys(ref, col("text"), n = 8),
      "doc_id", col("text"), n = 8))
    assert(viaKeys === direct)
    // persisted bucketed index, read back from disk (the q171 path)
    val name = "graft_test_span_idx"
    graft.sources.Sources.writeBucketedTable(
      graft.ops.Dedup.spanIndexKeys(ref, col("text"), n = 8),
      name, nBuckets = 4, bucketCols = Seq("__k"),
      path = Some(s"/tmp/graft_test_span_idx_${System.nanoTime()}"))
    val viaDisk = rows(graft.ops.Dedup.spanCutAgainstIndex(
      inc, spark.table(name), "doc_id", col("text"), n = 8))
    assert(viaDisk === direct)
    spark.sql(s"DROP TABLE IF EXISTS $name")
  }

  test("spanCutDedup: short and unique docs are untouched") {
    val got = cut(1L -> "a b c", 2L -> (1 to 12).map("u" + _).mkString(" "))(
      n = 8, minDocs = 2)
    assert(got(1L) === (("a b c", 3L, 0L)))
    assert(got(2L) === (((1 to 12).map("u" + _).mkString(" "), 12L, 0L)))
  }

  // ---------------------------------------------------------------- //
  //  mixtureByBudget                                                  //
  // ---------------------------------------------------------------- //

  private def mixDocs = ((0 until 300).map(i => ("big", i.toLong, 10L))
    ++ (1000 until 1010).map(i => ("tiny", i.toLong, 10L)))
    .toDF("g", "id", "w")

  test("mixtureByBudget caps each group's kept weight at the budget") {
    val kept = Sampling.mixtureByBudget(mixDocs, "g", "id", col("w"),
      budget = 500L, nBuckets = 64, seed = "m")
    val byG = kept.groupBy("g").agg(sum("w")).as[(String, Long)]
      .collect().toMap
    assert(byG("big") <= 500L, s"big kept ${byG("big")} > budget")
    assert(byG("big") >= 300L, s"big kept only ${byG("big")} of 500 budget " +
      "— more than one trailing bucket undershot") // 64 buckets ≈ 47 w/bucket
    assert(byG("tiny") == 100L) // under budget → kept whole
  }

  test("mixtureByBudget keeps a hash-bucket PREFIX, stable under repartitioning") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.mixtureByBudget(df, "g", "id", col("w"), 500L, 64, "m")
        .select("id").as[Long].collect().toSet
    val a = run(mixDocs)
    assert(a == run(mixDocs.repartition(13)))
    // prefix property: within each group, every kept bucket < every
    // dropped bucket (recomputed with the operator's own hash)
    val withB = mixDocs.withColumn("b",
      graft.ops.Dedup.hash60(concat(lit("m"), col("id").cast("string"))) % 64)
      .select("g", "id", "b").as[(String, Long, Long)].collect()
    val keptB = withB.filter(r => a.contains(r._2)).groupBy(_._1)
    val dropB = withB.filterNot(r => a.contains(r._2)).groupBy(_._1)
    for (g <- keptB.keys if dropB.contains(g))
      assert(keptB(g).map(_._3).max < dropB(g).map(_._3).min,
        s"group $g kept set is not a bucket prefix")
    // a larger budget keeps a superset (prefix monotonicity)
    val more = Sampling.mixtureByBudget(mixDocs, "g", "id", col("w"),
      1500L, 64, "m").select("id").as[Long].collect().toSet
    assert(a.subsetOf(more))
  }

  test("a group whose first bucket overshoots is dropped whole, not overshot") {
    val df = Seq(("fat", 1L, 900L), ("ok", 2L, 10L)).toDF("g", "id", "w")
    val kept = Sampling.mixtureByBudget(df, "g", "id", col("w"), 500L, 64, "m")
      .select("g").as[String].collect().toSeq
    assert(kept == Seq("ok"))
  }

  // ---------------------------------------------------------------- //
  //  quantizeInt8                                                     //
  // ---------------------------------------------------------------- //

  test("quantizeInt8: hand-computed scale and components, HALF_UP at .5") {
    val in = Seq((1L, Seq(3.0f, -1.5f, 0.0f))).toDF("vec_id", "embedding")
    val row = graft.ops.Similarity.quantizeInt8(in, "embedding").head
    assert(row.getAs[Double]("scale") == 3.0)
    // -1.5·127/3 = -63.5 → away from zero → -64 (both engines)
    assert(row.getAs[scala.collection.Seq[Byte]]("qvec").toSeq == Seq[Byte](127, -64, 0))
  }

  test("quantizeInt8: all-zero vector quantizes to zeros, not NaN") {
    val in = Seq((1L, Seq(0.0f, 0.0f))).toDF("vec_id", "embedding")
    val row = graft.ops.Similarity.quantizeInt8(in, "embedding").head
    assert(row.getAs[Double]("scale") == 0.0)
    assert(row.getAs[scala.collection.Seq[Byte]]("qvec").toSeq == Seq[Byte](0, 0))
  }

  test("quantizeInt8 bounds every component and reconstructs within a half step") {
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 50L).map(i =>
      (i, Seq.fill(16)(rnd.nextFloat() * 2 - 1)))
    val rows = graft.ops.Similarity.quantizeInt8(
      vecs.toDF("vec_id", "embedding"), "embedding")
      .select("embedding", "scale", "qvec").collect()
    rows.foreach { r =>
      val (v, s, q) = (r.getAs[scala.collection.Seq[Float]](0), r.getDouble(1),
        r.getAs[scala.collection.Seq[Byte]](2))
      assert(q.forall(b => b >= -127 && b <= 127))
      v.zip(q).foreach { case (x, b) =>
        assert(math.abs(x - b * s / 127.0) <= s / 254.0 + 1e-9,
          s"component $x reconstructed as ${b * s / 127.0} (scale $s)")
      }
    }
  }

  // ---------------------------------------------------------------- //
  //  Keyword extraction + script mix (round 14)                       //
  // ---------------------------------------------------------------- //

  test("keywordsTopK: rational tf-idf, hand-computed; corpus-wide token ranks below doc-specific") {
    import graft.ops.TextAnalysis
    // 3 tokenized docs: 'the' in all (df=3), 'cat' in 1 (df=1, tf=2)
    val df = Seq(
      1L -> "the cat cat sat", 2L -> "the dog sat", 3L -> "the bird",
      4L -> null.asInstanceOf[String], 5L -> " ")
      .toDF("doc_id", "text")
    val got = TextAnalysis.keywordsTopK(df, "doc_id", col("text"), k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getDouble(2), r.getLong(3)))).toMap
    // doc 1: cat tf=2 df=1 -> 2*3/1=6; sat tf=1 df=2 -> 1.5; the -> 1
    assert(got((1L, "cat")) == ((6.0, 1L)))
    assert(got((1L, "sat")) == ((1.5, 2L)))
    assert(!got.contains((1L, "the")), "k=2 cuts the stopword")
    // doc 3: bird 3.0 ranks above the 1.0
    assert(got((3L, "bird"))._2 == 1L && got((3L, "the"))._2 == 2L)
    // null and whitespace-only docs contribute nothing (N = 3)
    assert(!got.keys.exists(k => k._1 == 4L || k._1 == 5L))
  }

  test("scriptMix: code-point class fractions incl. CJK, empty/null excluded") {
    import graft.ops.TextAnalysis
    val df = Seq(
      1L -> "ab1 你好!", // 8 cps: 2 latin, 1 digit, 1 space, 2 cjk, 2 other(!)... recount below
      2L -> "abcd",
      3L -> null.asInstanceOf[String], 4L -> "")
      .toDF("doc_id", "text")
    val got = TextAnalysis.scriptMix(df, "doc_id", col("text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
    // "ab1 你好!" = a b 1 ' ' 你 好 ! → 7 code points
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == ((7L, r6(2.0 / 7), r6(1.0 / 7), r6(1.0 / 7),
      r6(2.0 / 7), r6(1.0 / 7))))
    assert(got(2L) == ((4L, 1.0, 0.0, 0.0, 0.0, 0.0)))
    assert(!got.contains(3L) && !got.contains(4L))
  }
}
