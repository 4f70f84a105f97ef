package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{CacheScope, Dedup, Similarity, TextAnalysis}

/** Cross-corpus incremental dedup, semantic (SemDeDup-style) dedup, and
  * the hashed linear scorer — each pinned against an independent
  * driver-side re-derivation of its contract (not against the operator's
  * own building blocks), over seeded randomized corpora. */
class CurationOpsSpec extends AnyFunSuite {

  import TestKit._
  import spark.implicits._

  // ---------------------------------------------------------------- //
  //  Cross-corpus incremental MinHash dedup                           //
  // ---------------------------------------------------------------- //

  private val K = 8
  private val RPB = 4

  /** Driver-side reference: banded candidates + signature agreement over
    * collected signatures, straight from the LSH definition. */
  private def refMatched(inc: Map[Long, Seq[Long]], ref: Map[Long, Seq[Long]],
      threshold: Double): Set[Long] = {
    def bands(sig: Seq[Long]): Seq[(Int, String)] =
      (0 until K / RPB).map(b =>
        b -> sig.slice(b * RPB, b * RPB + RPB).mkString(","))
    val refBands = ref.toSeq.flatMap { case (id, s) =>
      bands(s).map { case (b, k) => (b, k) -> id } }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    (for {
      (ia, sa) <- inc.toSeq
      (b, bk) <- bands(sa)
      ib <- refBands.getOrElse((b, bk), Nil)
      if sa.zip(ref(ib)).count { case (x, y) => x == y }.toDouble / K >= threshold
    } yield ia).toSet
  }

  private def corpus(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")

  test("dropNearDupsAgainst: identical incoming docs are dropped, fresh ones survive") {
    val ref = corpus(
      0L -> "a b c d e f g h i j",
      4L -> "k l m n o p q r s t",
      8L -> "u v w x y z aa bb cc dd")
    val inc = corpus(
      1L -> "a b c d e f g h i j", // exact copy of ref 0 → dropped
      2L -> "k l m n o p q r s XX", // near-copy of ref 4 (1 token off)
      3L -> "completely different words entirely here now ok fine yes sure",
      5L -> "short") // under 3 words: no signature, must survive
    val incSigs = Dedup.minHashSignatures(inc, "doc_id", col("text"), 3, K)
    val refSigs = Dedup.minHashSignatures(ref, "doc_id", col("text"), 3, K)
    val matched = Dedup.minhashMatchedAgainst(incSigs, refSigs, "doc_id",
      K, RPB, threshold = 0.5)
    val out = Dedup.dropNearDupsAgainst(inc, "doc_id", matched)
      .select("doc_id").as[Long].collect().toSet
    assert(!out.contains(1L), "exact duplicate of a reference doc must be dropped")
    assert(out.contains(3L), "unrelated doc must survive")
    assert(out.contains(5L), "doc too short to sign must survive")
    // near-copy: decided by signature agreement — assert consistency with
    // the driver-side reference rather than hardcoding the LSH outcome
    val sigOf = (df: org.apache.spark.sql.DataFrame) =>
      df.select(col("doc_id"), col("sig")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1).toList.asInstanceOf[Seq[Long]]).toMap
    val expectDropped = refMatched(sigOf(incSigs), sigOf(refSigs), 0.5)
    assert(out == Set(1L, 2L, 3L, 5L) -- expectDropped)
  }

  test("property: cross-corpus matches == driver-side banded-agreement reference (4 seeds)") {
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
      def doc() = Seq.fill(6 + rnd.nextInt(5))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val ref = corpus((0L until 12L).map(i => (i * 2) -> doc()): _*) // even ids
      val inc = corpus((0L until 12L).map(i => (i * 2 + 1) -> doc()): _*) // odd ids
      val incSigs = CacheScope.session.cache(
        Dedup.minHashSignatures(inc, "doc_id", col("text"), 3, K))
      val refSigs = CacheScope.session.cache(
        Dedup.minHashSignatures(ref, "doc_id", col("text"), 3, K))
      val got = Dedup.minhashMatchedAgainst(incSigs, refSigs, "doc_id",
        K, RPB, threshold = 0.5).as[Long].collect().toSet
      val sigOf = (df: org.apache.spark.sql.DataFrame) =>
        df.select(col("doc_id"), col("sig")).collect()
          .map(r => r.getLong(0) -> r.getSeq[Long](1).toList.asInstanceOf[Seq[Long]]).toMap
      val want = refMatched(sigOf(incSigs), sigOf(refSigs), 0.5)
      assert(got == want, s"seed=$seed")
      spark.sharedState.cacheManager.clearCache()
    }
  }

  test("lshCandidatesAgainst generates NO within-corpus pairs and respects per-side caps") {
    // two incoming docs identical to each other but unlike the reference:
    // a self-join would pair them; the cross join must not
    val inc = corpus(
      1L -> "x y z x y z x y z x",
      3L -> "x y z x y z x y z x")
    val ref = corpus(2L -> "p q r s t u v w p q")
    val is = Dedup.minHashSignatures(inc, "doc_id", col("text"), 3, K)
    val rs = Dedup.minHashSignatures(ref, "doc_id", col("text"), 3, K)
    assert(Dedup.lshCandidatesAgainst(is, rs, "doc_id", K, RPB).count() == 0)
    // cap: 3 identical reference docs with maxBucket=2 → ref side's
    // bucket (3 members) is dropped entirely, so the incoming copy matches nothing
    val ref3 = corpus(2L -> "x y z x y z x y z x", 4L -> "x y z x y z x y z x",
      6L -> "x y z x y z x y z x")
    val rs3 = Dedup.minHashSignatures(ref3, "doc_id", col("text"), 3, K)
    assert(Dedup.lshCandidatesAgainst(is, rs3, "doc_id", K, RPB,
      maxBucket = 2).count() == 0)
    assert(Dedup.lshCandidatesAgainst(is, rs3, "doc_id", K, RPB,
      maxBucket = 3).count() == 6, "uncapped: 2 incoming x 3 reference")
    spark.sharedState.cacheManager.clearCache()
  }

  // ---------------------------------------------------------------- //
  //  Semantic dedup                                                   //
  // ---------------------------------------------------------------- //

  /** Driver-side int8 quantization — Spark round() is HALF_UP (away from
    * zero), which scala math.round is NOT for negative halves. */
  private def quant(v: Seq[Float]): Seq[Long] = {
    val s = v.map(x => math.abs(x.toDouble)).max
    if (s == 0.0) v.map(_ => 0L)
    else v.map(x => BigDecimal(x.toDouble * 127.0 / s)
      .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toLong)
  }

  /** Driver-side semantic dedup reference, straight from the contract. */
  private def refSemantic(vecs: Map[Long, Seq[Float]], signBits: Int,
      threshold: Double): Set[(Long, Long, Boolean, Option[Double])] = {
    val q = vecs.map { case (id, v) => id -> quant(v) }
    val bkt = vecs.map { case (id, v) =>
      id -> (0 until signBits).map(i => if (v(i) >= 0) 1L << i else 0L).sum }
    val nsq = q.map { case (id, qq) => id -> qq.map(x => x * x).sum }
    bkt.groupBy(_._2).flatMap { case (b, members0) =>
      val members = members0.keys.toSeq.sorted
      val cent = (0 until q(members.head).size).map(d => members.map(q(_)(d)).sum)
      val scores = members.map { id =>
        val dot = q(id).zip(cent).map { case (a, c) => a * c }.sum
        id -> (if (nsq(id) == 0L) -1e18 else dot.toDouble / math.sqrt(nsq(id).toDouble))
      }.toMap
      val keeper = members.minBy(id => (-scores(id), id))
      members.flatMap { id =>
        val cos =
          if (nsq(id) == 0L || nsq(keeper) == 0L) 0.0
          else BigDecimal(q(id).zip(q(keeper)).map { case (a, c) => a * c }.sum.toDouble /
            (math.sqrt(nsq(id).toDouble) * math.sqrt(nsq(keeper).toDouble)))
            .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
        val isRep = id == keeper
        if (isRep || nsq(id) == 0L || cos < threshold)
          Some((id, b, isRep, Some(cos)))
        else None
      }
    }.toSet
  }

  private def embDf(rows: (Long, Seq[Float])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  test("semanticDedup: representative kept, near members dropped, far + zero-norm kept") {
    val base = Seq(1f, 1f, 1f, 1f)
    val out = Dedup.semanticDedup(embDf(
      10L -> base,
      11L -> Seq(1f, 1f, 1f, 0.9f), // cos to rep ~1 → dropped
      12L -> Seq(1f, 1f, -5f, 1f), // same bucket? no: sign differs → other cell
      13L -> Seq(0f, 0f, 0f, 0f) // zero-norm: kept by convention
    ), "vec_id", col("embedding"), signBits = 4, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toMap
    assert(out.contains(10L) || out.contains(11L), "one of the twins is the rep")
    assert(!(out.contains(10L) && out.contains(11L)), "the other twin is dropped")
    assert(out.contains(12L) && out.contains(13L))
    assert(out(13L) == false || out(13L) == true) // present; flag value covered below
    spark.sharedState.cacheManager.clearCache()
  }

  test("property: semanticDedup == driver-side reference (4 seeds, clustered corpus)") {
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(100 + seed)
      // clustered corpus: a few anchor directions + jittered copies, so
      // cells actually hold near-duplicates and the threshold bites
      val anchors = Seq.fill(4)(Seq.fill(6)(rnd.nextFloat() * 2 - 1))
      val vecs: Map[Long, Seq[Float]] = (0L until 24L).map { id =>
        val a = anchors(rnd.nextInt(anchors.size))
        id -> a.map(x => (x + (rnd.nextFloat() - 0.5f) * 0.1f).toFloat)
      }.toMap + (24L -> Seq.fill(6)(0f)) // plus one zero vector
      val got = Dedup.semanticDedup(embDf(vecs.toSeq: _*), "vec_id",
        col("embedding"), signBits = 4, threshold = 0.8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet
      val want = refSemantic(vecs, 4, 0.8)
      assert(got == want, s"seed=$seed\n got=${got.toSeq.sortBy(_._1)}\nwant=${want.toSeq.sortBy(_._1)}")
      assert(got.exists(!_._3) || got.size < vecs.size) // non-vacuous either way
      spark.sharedState.cacheManager.clearCache()
    }
  }

  test("semanticDedup multi-probe: one-bit-miss near-dups caught, probes=1 unchanged") {
    // rep cell 0b1111: two members (10 elects as rep by centroid).
    // 20 sits ONE low-confidence hyperplane away (dim 0 barely negative,
    // so cell 0b1110) with high cosine to the rep; 21 is a far vector in
    // the same neighbor cell. At probes=1 both 20 and 21 survive (20 is
    // invisible); at probes=2 the rep registers into 0b1110 and drops 20
    // while 21 stays (cosine below threshold).
    val rows = embDf(
      10L -> Seq(1f, 1f, 1f, 1f),
      11L -> Seq(1f, 1f, 1f, 0.9f),       // same-cell near-dup: dropped both ways
      20L -> Seq(-0.01f, 1f, 1f, 1f),     // one-bit miss, cos≈0.86 to rep
      21L -> Seq(-1f, 1f, -0f, -0f))      // same neighbor cell, far
    def run(p: Int) = Dedup.semanticDedup(rows, "vec_id", col("embedding"),
        signBits = 4, threshold = 0.8, probes = p)
      .collect().map(r => r.getLong(0)).toSet
    val p1 = run(1)
    assert(p1.contains(20L) && p1.contains(21L),
      "probes=1: the one-bit-miss near-dup is invisible")
    val p2 = run(2)
    assert(!p2.contains(20L), "probes=2: neighbor-cell member dropped")
    assert(p2.contains(21L), "far neighbor-cell member survives")
    assert((p1 - 20L) == p2, "only the near-dup's verdict changes")
    spark.sharedState.cacheManager.clearCache()
  }

  test("semanticDedup multi-probe: near-dup singleton REPS dedupe, smaller id wins") {
    // two near-identical vectors, each alone in its cell (one crossed
    // hyperplane apart) — both are reps, invisible to the member rule;
    // the rep-vs-rep rule keeps the smaller id only
    val rows = embDf(
      30L -> Seq(1f, 1f, 1f, 1f),
      31L -> Seq(-0.01f, 1f, 1f, 1f))
    def run(p: Int) = Dedup.semanticDedup(rows, "vec_id", col("embedding"),
        signBits = 4, threshold = 0.8, probes = p)
      .collect().map(r => r.getLong(0)).toSet
    assert(run(1) == Set(30L, 31L), "probes=1: both singleton reps survive")
    assert(run(2) == Set(30L), "probes=2: the larger-id rep is dropped")
    spark.sharedState.cacheManager.clearCache()
  }

  test("semanticDedup: overfull cells pass through undeduped (cos_rep null)") {
    val twin = Seq(1f, 1f, 1f)
    val out = Dedup.semanticDedup(
      embDf(1L -> twin, 2L -> twin, 3L -> twin), "vec_id",
      col("embedding"), signBits = 3, threshold = 0.5, maxBucket = 2)
      .collect().map(r => (r.getLong(0), r.getBoolean(2), r.isNullAt(3))).toSet
    assert(out == Set((1L, false, true), (2L, false, true), (3L, false, true)),
      "capped cell: every member survives, none is rep, cos_rep is null")
    spark.sharedState.cacheManager.clearCache()
  }

  // ---------------------------------------------------------------- //
  //  Hashed linear score                                              //
  // ---------------------------------------------------------------- //

  /** Driver-side reference scorer sharing only the md5 primitive. */
  private def refScore(text: String, w: Array[Double], bigrams: Boolean): (Long, Double) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(s: String): Long = java.lang.Long.parseLong(
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
    val toks = text.split(" ", -1).toSeq
    val grams = toks ++ (if (bigrams && toks.size >= 2)
      toks.sliding(2).map(_.mkString(" ")).toSeq else Nil)
    val sum = grams.map(g => w((h60(g) % w.length).toInt)).sum
    (grams.size.toLong, sum)
  }

  test("hashedLinearScore matches the driver-side reference (uni+bigram and uni-only)") {
    val w = TextAnalysis.md5Weights(64, "t")
    assert(w.forall(x => x >= -1000 && x <= 1000 && x == math.rint(x)))
    val texts = Seq(
      1L -> "the cat sat on the mat",
      2L -> "one",
      3L -> "a b a b a b",
      4L -> "numbers 123 and symbols !?")
    for (bigrams <- Seq(true, false)) {
      val got = TextAnalysis.hashedLinearScore(
        texts.toDF("doc_id", "text"), "doc_id", col("text"), w, bigrams)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      texts.foreach { case (id, t) =>
        val (n, s) = refScore(t, w, bigrams)
        assert(got(id) == ((n, s)), s"doc $id bigrams=$bigrams")
      }
    }
  }

  test("hashedLinearScore: mean_weight is the 6-dp per-gram mean") {
    val w = TextAnalysis.md5Weights(16, "m")
    val r = TextAnalysis.hashedLinearScore(
      Seq(1L -> "x y z").toDF("doc_id", "text"), "doc_id", col("text"), w)
      .collect().head
    val mean = BigDecimal(r.getDouble(2) / r.getLong(1))
      .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(3) == mean)
  }

  test("hashedGramCounts/lmTermMicros/hashedGramScore match a driver-side LM; null text excluded") {
    val b = 32
    val train = Seq(10L -> "the cat sat", 20L -> "the dog sat on the cat")
    val score = Seq(1L -> "the cat", 2L -> "a new dog", 3L -> "one")
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(s: String): Long = java.lang.Long.parseLong(
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
    def grams(t: String): Seq[String] = {
      val toks = t.split(" ", -1).toSeq
      toks ++ (if (toks.size >= 2) toks.sliding(2).map(_.mkString(" ")).toSeq else Nil)
    }
    val refCounts = new Array[Long](b)
    train.flatMap(d => grams(d._2)).foreach(g => refCounts((h60(g) % b).toInt) += 1)
    val refTotal = refCounts.sum

    val (counts, total) = TextAnalysis.hashedGramCounts(
      train.toDF("doc_id", "text"), col("text"), b)
    assert(counts.toSeq == refCounts.toSeq && total == refTotal)

    val terms = TextAnalysis.lmTermMicros(counts, total)
    terms.zip(counts).foreach { case (tm, c) =>
      val x = math.log((c + 1).toDouble / (total + b).toDouble) * 1e6
      assert(tm == (if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong))
      assert(tm < 0, "add-one-smoothed log-probs are negative")
    }

    val withNull = score :+ (9L -> (null: String))
    val got = TextAnalysis.hashedGramScore(
      withNull.toDF("doc_id", "text"), "doc_id", col("text"), terms)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(!got.contains(9L), "null-text docs have no grams to score")
    score.foreach { case (id, t) =>
      val gs = grams(t)
      val want = gs.map(g => terms((h60(g) % b).toInt)).sum
      assert(got(id) == ((gs.size.toLong, want)), s"doc $id")
    }
  }

  test("bpePairCounts: vocab-weighted adjacent pairs, hash ties, code-point pairs for CJK") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(s: String): Long = java.lang.Long.parseLong(
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
    val df = Seq(1L -> "ab ab cd", 2L -> "abc", 3L -> "你好 你好", 4L -> "x")
      .toDF("doc_id", "text") // "x" is a 1-char word: no pair
    val got = TextAnalysis.bpePairCounts(df, col("text"), k = 10)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // counts: ab = 2 (word "ab" ×2) + 1 (inside "abc"); 你好 = 2; cd, bc = 1
    assert(got.view.mapValues(_._1).toMap ==
      Map("ab" -> 3L, "你好" -> 2L, "cd" -> 1L, "bc" -> 1L))
    assert(got("ab")._2 == 1L && got("你好")._2 == 2L)
    // the two singletons order by ascending md5 hash
    val (lo, hi) = if (h60("cd") < h60("bc")) ("cd", "bc") else ("bc", "cd")
    assert(got(lo)._2 == 3L && got(hi)._2 == 4L)
  }

  test("hashedGramScore under a DSIR difference table == target score − background score") {
    val b = 16
    val docs = Seq(1L -> "x y z", 2L -> "p q x", 3L -> "z z z z")
    val (tc, tt) = TextAnalysis.hashedGramCounts(
      Seq(0L -> "x y x z").toDF("doc_id", "text"), col("text"), b)
    val (bc, bt) = TextAnalysis.hashedGramCounts(
      Seq(0L -> "p q r s p").toDF("doc_id", "text"), col("text"), b)
    val (tTerms, bTerms) = (TextAnalysis.lmTermMicros(tc, tt),
      TextAnalysis.lmTermMicros(bc, bt))
    val diff = tTerms.zip(bTerms).map { case (a, c) => a - c }
    def scores(terms: Array[Long]) = TextAnalysis.hashedGramScore(
      docs.toDF("doc_id", "text"), "doc_id", col("text"), terms)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val (st, sb, sd) = (scores(tTerms), scores(bTerms), scores(diff))
    docs.foreach { case (id, _) =>
      assert(sd(id) == st(id) - sb(id), s"doc $id") // fold is linear in the table
    }
  }

  test("dropNearDupsAgainstLive: LIVE stream survivors == batch twin, ZERO state operators") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val rnd = new scala.util.Random(7)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    def doc() = Seq.fill(6 + rnd.nextInt(5))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val refRows = (0L until 12L).map(i => (i * 2) -> doc())
    val incRows = (0L until 12L).map(i => (i * 2 + 1) -> doc()) :+
      (101L -> refRows.head._2) :+ // exact copy of a reference doc
      (103L -> "xy") // too short to sign — must survive
    val ref = corpus(refRows: _*)
    val refSigs = CacheScope.session.cache(
      Dedup.minHashSignatures(ref, "doc_id", col("text"), 3, K))
    def live(in: org.apache.spark.sql.DataFrame) =
      Dedup.dropNearDupsAgainstLive(in, refSigs, "doc_id", col("text"),
        n = 3, k = K, rowsPerBand = RPB, threshold = 0.5)
    // batch twin #1: the same operator on a batch frame; batch twin #2:
    // the candidates+verify form — all three must agree
    val batchSame = live(corpus(incRows: _*))
      .select("doc_id").as[Long].collect().toSet
    val incSigs = Dedup.minHashSignatures(corpus(incRows: _*), "doc_id",
      col("text"), 3, K)
    val batchClassic = Dedup.dropNearDupsAgainst(corpus(incRows: _*), "doc_id",
      Dedup.minhashMatchedAgainst(incSigs, refSigs, "doc_id", K, RPB, 0.5))
      .select("doc_id").as[Long].collect().toSet
    assert(batchSame == batchClassic)
    assert(!batchSame.contains(101L) && batchSame.contains(103L))
    // live: same rows through a MemoryStream, and the query must report
    // NO state operators (the whole point of the chained form)
    val ms = MemoryStream[(Long, String)]
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = live(ms.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val ids = b.select("doc_id").collect().map(_.getLong(0))
        out.synchronized { out ++= ids }
        ()
      }.start()
    try {
      ms.addData(incRows.take(7): _*); q.processAllAvailable()
      ms.addData(incRows.drop(7): _*); q.processAllAvailable()
      val sp = q.lastProgress
      assert(sp == null || sp.stateOperators.isEmpty,
        s"expected stateless plan, got ${Option(sp).map(_.stateOperators.length)}")
    } finally q.stop()
    assert(out.synchronized(out.toSet) == batchSame,
      "live survivors == batch twin")
    spark.sharedState.cacheManager.clearCache()
  }

  // ---------------------------------------------------------------- //
  //  Embedding-side incremental dedup                                 //
  // ---------------------------------------------------------------- //

  /** Driver-side 6-dp cosine, CosineSim's sequential double fold. */
  private def cos6(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    a.indices.foreach { i =>
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
    }
    BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
      .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("cosineMatchedAgainst: same-cell cross-side matches only; sign-crossed near-dup invisible") {
    val ref = embDf(
      0L -> Seq(1f, 1f, 0.5f, 0f),
      4L -> Seq(-1f, 1f, 0f, 0f))
    val inc = embDf(
      1L -> Seq(1f, 1f, 0.5f, 0.01f), // near-copy of ref 0, same cell → matched
      2L -> Seq(1f, 1f, 0.5f, 0.01f), // identical to inc 1: within-side must NOT pair
      3L -> Seq(-1f, -1f, -0.5f, 0f), // negation of ref 0: different cell → invisible
      5L -> Seq(0.9f, -1f, 0.5f, 0f)) // unlike any reference
    val matched = Dedup.cosineMatchedAgainst(inc, ref, "vec_id",
      col("embedding"), signBits = 4, threshold = 0.9)
      .as[Long].collect().toSet
    assert(matched == Set(1L, 2L),
      "both same-cell near-copies of ref 0 match; nothing else")
    val out = Dedup.dropNearDupsAgainst(inc, "vec_id", matched.toSeq.toDF("vec_id"))
      .select("vec_id").as[Long].collect().toSet
    assert(out == Set(3L, 5L))
  }

  test("cosineMatchedAgainst probes>1: single-bit-crossed near-dup becomes visible; matched set is a superset") {
    // ref 0's dim 2 is the least-confident sign (|0.01|); inc 1 is a
    // near-copy sitting on the OTHER side of that hyperplane
    val ref = embDf(0L -> Seq(1f, 1f, 0.01f, 1f))
    val inc = embDf(
      1L -> Seq(1f, 1f, -0.01f, 1f), // one crossed plane: invisible at probes=1
      3L -> Seq(-1f, -1f, 1f, -1f))  // far in sign space: invisible at any probes<=2
    def matched(p: Int) = Dedup.cosineMatchedAgainst(inc, ref, "vec_id",
      col("embedding"), signBits = 4, threshold = 0.9, probes = p)
      .as[Long].collect().toSet
    assert(matched(1) == Set.empty[Long])
    assert(matched(2) == Set(1L), "ref registers under its dim-2 flip cell")
    // property: matched(probes) ⊇ matched(probes-1) on random data
    val rnd = new scala.util.Random(7)
    def vec() = Seq.fill(6)((rnd.nextDouble() * 2 - 1).toFloat)
    val bigRef = embDf((0L until 40L).map(i => (i * 2) -> vec()): _*)
    val bigInc = embDf((0L until 40L).map(i => (i * 2 + 1) -> vec()): _*)
    val sets = (1 to 4).map(p => Dedup.cosineMatchedAgainst(bigInc, bigRef,
      "vec_id", col("embedding"), signBits = 4, threshold = 0.5, probes = p)
      .as[Long].collect().toSet)
    sets.sliding(2).foreach { case Seq(lo, hi) =>
      assert(lo.subsetOf(hi), "raising probes never loses a match") }
  }

  test("cosineDropAgainstLive probes>1: survivors == batch multi-probe twin, plan still stateless") {
    val rnd = new scala.util.Random(23)
    def vec() = Seq.fill(6)((rnd.nextDouble() * 2 - 1).toFloat)
    val ref = embDf((0L until 25L).map(i => (i * 2) -> vec()): _*)
    val inc = embDf(((0L until 25L).map(i => (i * 2 + 1) -> vec()) :+
      (201L -> Seq(1f, 1f, -0.01f, 0.5f, 0.5f, 0.5f))): _*)
    val refX = embDf(((0L until 25L).map(i => (i * 2) -> vec())
      :+ (200L -> Seq(1f, 1f, 0.01f, 0.5f, 0.5f, 0.5f))): _*)
    val live = Dedup.cosineDropAgainstLive(inc, refX, "vec_id",
      col("embedding"), signBits = 3, threshold = 0.9, probes = 3)
      .select("vec_id").as[Long].collect().toSet
    val batch = Dedup.dropNearDupsAgainst(inc, "vec_id",
      Dedup.cosineMatchedAgainst(inc, refX, "vec_id", col("embedding"),
        signBits = 3, threshold = 0.9, probes = 3))
      .select("vec_id").as[Long].collect().toSet
    assert(live == batch)
    assert(!live.contains(201L),
      "the bit-crossed near-copy of ref 200 is dropped via its registration cell")
  }

  test("cosineMatchedAgainst: per-side cap drops the degenerate side's cell only") {
    // three identical reference vectors in one cell, maxBucket=2: the
    // REFERENCE cell is dropped, so the incoming copy matches nothing
    val ref = embDf(0L -> Seq(1f, 1f), 2L -> Seq(1f, 1f), 4L -> Seq(1f, 1f))
    val inc = embDf(1L -> Seq(1f, 1f))
    assert(Dedup.cosineMatchedAgainst(inc, ref, "vec_id", col("embedding"),
      signBits = 2, threshold = 0.9, maxBucket = 2).count() == 0)
    assert(Dedup.cosineMatchedAgainst(inc, ref, "vec_id", col("embedding"),
      signBits = 2, threshold = 0.9, maxBucket = 3).count() == 1)
  }

  test("property: cosineMatchedAgainst == driver-side reference (4 seeds)") {
    for (seed <- 11 to 14) {
      val rnd = new scala.util.Random(seed)
      def vec() = Seq.fill(6)((rnd.nextDouble() * 2 - 1).toFloat)
      val refV = (0L until 30L).map(i => (i * 2) -> vec()).toMap
      val incV = (0L until 30L).map(i => (i * 2 + 1) -> vec()).toMap
      val thr = 0.6
      val bits = 3
      def cell(v: Seq[Float]) =
        (0 until bits).map(i => if (v(i) >= 0) 1L << i else 0L).sum
      val want = incV.collect { case (ia, va) if refV.exists { case (_, vb) =>
        cell(va) == cell(vb) && cos6(va, vb) >= thr } => ia }.toSet
      val got = Dedup.cosineMatchedAgainst(
        embDf(incV.toSeq: _*), embDf(refV.toSeq: _*), "vec_id",
        col("embedding"), signBits = bits, threshold = thr)
        .as[Long].collect().toSet
      assert(got == want, s"seed=$seed")
    }
  }

  test("dropNearDupsAgainstLive: restart recovery is OFFSETS-ONLY (no state to rebuild, no re-emission)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val ref = corpus(0L -> "a b c d e f g h i j")
    val refSigs = CacheScope.session.cache(
      Dedup.minHashSignatures(ref, "doc_id", col("text"), 3, K))
    def live(in: org.apache.spark.sql.DataFrame) =
      Dedup.dropNearDupsAgainstLive(in, refSigs, "doc_id", col("text"),
        n = 3, k = K, rowsPerBand = RPB, threshold = 0.5)
    val ckptDir = java.nio.file.Files.createTempDirectory("graft-ingest-ckpt-")
    val ms = MemoryStream[(Long, String)]
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    def start() = live(ms.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckptDir.toString)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val ids = b.select("doc_id").collect().map(_.getLong(0))
        out.synchronized { out ++= ids }
        ()
      }.start()
    val q1 = start()
    try {
      ms.addData(1L -> "a b c d e f g h i j", 2L -> "q r s t u v w x y z")
      q1.processAllAvailable()
    } finally q1.stop()
    assert(out.synchronized(out.toSet) == Set(2L), "dup of ref dropped pre-restart")
    // restart against the same checkpoint: the committed batch must NOT
    // re-emit (offsets restored), and new data dedups correctly with no
    // state recovery at all (there is none to recover)
    val q2 = start()
    try {
      ms.addData(3L -> "a b c d e f g h i j", 4L -> "k l m n o p k l m n")
      q2.processAllAvailable()
      assert(q2.lastProgress == null || q2.lastProgress.stateOperators.isEmpty)
    } finally q2.stop()
    assert(out.synchronized(out.toSet) == Set(2L, 4L),
      "no re-emission of batch 1, dup dropped and fresh doc kept post-restart")
    org.apache.commons.io.FileUtils.deleteDirectory(ckptDir.toFile)
    spark.sharedState.cacheManager.clearCache()
  }

  test("cosineDropAgainstLive: LIVE stream survivors == batch twin, ZERO state operators") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val rnd = new scala.util.Random(9)
    def vec() = Seq.fill(6)((rnd.nextDouble() * 2 - 1).toFloat)
    val refRows = (0L until 20L).map(i => (i * 2) -> vec())
    val incRows = (0L until 20L).map(i => (i * 2 + 1) -> vec()) :+
      (101L -> refRows.head._2) // exact copy of a reference vector
    val ref = embDf(refRows: _*)
    def live(in: org.apache.spark.sql.DataFrame) =
      Dedup.cosineDropAgainstLive(in, ref, "vec_id", col("embedding"),
        signBits = 3, threshold = 0.6)
    val batchSame = live(embDf(incRows: _*))
      .select("vec_id").as[Long].collect().toSet
    val batchClassic = Dedup.dropNearDupsAgainst(embDf(incRows: _*), "vec_id",
      Dedup.cosineMatchedAgainst(embDf(incRows: _*), ref, "vec_id",
        col("embedding"), signBits = 3, threshold = 0.6))
      .select("vec_id").as[Long].collect().toSet
    assert(batchSame == batchClassic)
    assert(!batchSame.contains(101L), "the exact copy is dropped")
    val ms = MemoryStream[(Long, Seq[Float])]
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = live(ms.toDF().toDF("vec_id", "embedding"))
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val ids = b.select("vec_id").collect().map(_.getLong(0))
        out.synchronized { out ++= ids }
        ()
      }.start()
    try {
      ms.addData(incRows.take(10): _*); q.processAllAvailable()
      ms.addData(incRows.drop(10): _*); q.processAllAvailable()
      val sp = q.lastProgress
      assert(sp == null || sp.stateOperators.isEmpty, "expected stateless plan")
    } finally q.stop()
    assert(out.synchronized(out.toSet) == batchSame)
    spark.sharedState.cacheManager.clearCache()
  }

  test("spanIndexAppend: new keys = survivor-text shingles absent from " +
      "the index; the updated index equals rebuilding over ref UNION " +
      "survivor texts; batch 2 sees batch 1's survivors") {
    val shared = (1 to 10).map("s" + _)
    val b1only = (1 to 10).map("x" + _)
    val refDocs = Seq(0L -> ((1 to 15).map("r" + _).mkString(" ")))
      .toDF("doc_id", "text")
    // doc 1: a ref-shared prefix (cut) + its own tail (survives);
    // doc 3: entirely its own text (survives whole)
    val b1 = Seq(
      1L -> (((1 to 15).map("r" + _)) ++ b1only).mkString(" "),
      3L -> shared.mkString(" ")).toDF("doc_id", "text")
    val idx1 = CacheScope.session.cache(
      Dedup.spanIndexKeys(refDocs, col("text"), n = 8))
    val b1cut = CacheScope.session.cache(
      Dedup.spanCutAgainstIndex(b1, idx1, "doc_id", col("text"), n = 8))
    val newKeys = Dedup.spanIndexAppend(idx1, b1cut, col("dedup_text"), n = 8)
    // new keys are disjoint from the standing index
    assert(newKeys.join(idx1, Seq("__k"), "left_semi").count() === 0L)
    // and equal the shingle set of the survivors' reassembled text
    // minus the standing keys (the contract, re-derived)
    val expected = Dedup.spanIndexKeys(b1cut, col("dedup_text"), n = 8)
      .join(idx1, Seq("__k"), "left_anti")
    assert(newKeys.collect().map(_.getString(0)).toSet ===
      expected.collect().map(_.getString(0)).toSet)
    // updated index == rebuilding from scratch over ref + survivor text
    val idx2 = idx1.unionByName(newKeys)
    val rebuilt = Dedup.spanIndexKeys(
      refDocs.select(col("text"))
        .unionByName(b1cut.select(col("dedup_text").as("text"))),
      col("text"), n = 8)
    assert(idx2.collect().map(_.getString(0)).toSet ===
      rebuilt.collect().map(_.getString(0)).toSet)
    // batch 2 repeats batch 1's SURVIVING text (shared - never in the
    // reference): a frozen index admits it, the updated index cuts it
    val b2 = Seq(5L -> shared.mkString(" ")).toDF("doc_id", "text")
    val frozen = Dedup.spanCutAgainstIndex(b2, idx1, "doc_id",
      col("text"), n = 8).select("n_tokens_cut").as[Long].collect()
    val updated = Dedup.spanCutAgainstIndex(b2, idx2, "doc_id",
      col("text"), n = 8).select("n_tokens_cut").as[Long].collect()
    assert(frozen.toSeq === Seq(0L), "frozen index re-admits the text")
    assert(updated.toSeq === Seq(10L), "updated index cuts all 10 tokens")
    spark.sharedState.cacheManager.clearCache()
  }

  test("spanIndexAppend: PERSISTED append - appending the new keys to " +
      "the standing bucketed table makes the table probe equal the " +
      "in-memory union (the deployment ingest loop)") {
    val shared = (1 to 10).map("s" + _)
    val refDocs = Seq(0L -> ((1 to 15).map("r" + _).mkString(" ")))
      .toDF("doc_id", "text")
    val b1 = Seq(3L -> shared.mkString(" ")).toDF("doc_id", "text")
    val tbl = "graft_test_span_idx_append"
    val path = java.nio.file.Files
      .createTempDirectory("graft-span-append-").toString
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    // every frame reused AFTER the append derives from SOURCE lineage,
    // never from spark.table(tbl): Spark invalidates caches over a
    // table when it is written, so even a materialized plan reading
    // the table recomputes against the appended content (the
    // spanIndexAppend scaladoc hazard, pinned here)
    val refKeys = CacheScope.session.cache(
      Dedup.spanIndexKeys(refDocs, col("text"), n = 8))
    graft.sources.Sources.writeBucketedTable(refKeys,
      tbl, nBuckets = 4, bucketCols = Seq("__k"),
      path = Some(path + "/idx"))
    val b1cut = CacheScope.session.cache(Dedup.spanCutAgainstIndex(
      b1, refKeys, "doc_id", col("text"), n = 8))
    val newKeys = Dedup.spanIndexAppend(refKeys, b1cut,
      col("dedup_text"), n = 8)
    // the append keeps the table's bucketing (datasource bucketed
    // append), so later probes still skip the index-side exchange
    newKeys.write.mode("append").format("parquet")
      .bucketBy(4, "__k").saveAsTable(tbl)
    val b2 = Seq(5L -> shared.mkString(" ")).toDF("doc_id", "text")
    val viaTable = Dedup.spanCutAgainstIndex(b2, spark.table(tbl),
      "doc_id", col("text"), n = 8).collect().map(_.toSeq).toSet
    val viaUnion = Dedup.spanCutAgainstIndex(b2,
      refKeys.unionByName(newKeys),
      "doc_id", col("text"), n = 8).collect().map(_.toSeq).toSet
    assert(viaTable === viaUnion)
    // and the appended table actually cuts the repeated survivor text
    assert(viaTable.exists(r => r(3) == 10L))
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(path))
    spark.sharedState.cacheManager.clearCache()
  }

  test("spanCutIngestLive: LIVE stream cuts == batch twin across batch " +
      "splits, ZERO state operators (standing index carries all state)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val shared = (1 to 10).map("s" + _)
    val refDocs = Seq(0L -> shared.mkString(" "),
      2L -> (1 to 15).map("r" + _).mkString(" "))
    val incRows = Seq(
      1L -> (shared ++ (1 to 10).map("a" + _)).mkString(" "), // prefix cut
      3L -> (1 to 12).map("d" + _).mkString(" "),             // untouched
      5L -> (1 to 15).map("r" + _).mkString(" "),             // fully cut
      7L -> "a b c")                                          // short
    val refIndex = CacheScope.session.cache(
      Dedup.spanIndexKeys(refDocs.toDF("doc_id", "text"), col("text"), n = 8))
    val batchTwin = Dedup.spanCutAgainstIndex(
        incRows.toDF("doc_id", "text"), refIndex, "doc_id", col("text"), n = 8)
      .collect().map(_.toSeq).toSet
    // same truth as the non-indexed form
    assert(batchTwin === Dedup.spanCutAgainst(
      incRows.toDF("doc_id", "text"), refDocs.toDF("doc_id", "text"),
      "doc_id", col("text"), n = 8).collect().map(_.toSeq).toSet)
    val ms = MemoryStream[(Long, String)]
    val out = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_spanlive")
    val q = graft.stream.Streamed.spanCutIngestLive(
      ms.toDF().toDF("doc_id", "text"), refIndex, "doc_id", col("text"),
      n = 8, checkpoint = ckpt.toString) { b =>
      val rows = b.collect().map(_.toSeq)
      out.synchronized { out ++= rows }
    }
    try {
      // batch split straddles the cut/uncut docs — split invariance is
      // the contract (documents do not interact)
      ms.addData(incRows.take(2): _*); q.processAllAvailable()
      ms.addData(incRows.drop(2): _*); q.processAllAvailable()
      val sp = q.lastProgress
      assert(sp == null || sp.stateOperators.isEmpty,
        s"expected zero state operators, got ${Option(sp).map(_.stateOperators.length)}")
    } finally q.stop()
    assert(out.synchronized(out.toSet) === batchTwin,
      "live cuts == batch twin")
    org.apache.commons.io.FileUtils.deleteDirectory(ckpt.toFile)
    spark.sharedState.cacheManager.clearCache()
  }

  test("spanCutIngestLive: restart recovery is OFFSETS-ONLY (no " +
      "re-emission, no state to rebuild, standing index unchanged)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val shared = (1 to 10).map("s" + _)
    val refIndex = CacheScope.session.cache(Dedup.spanIndexKeys(
      Seq(0L -> shared.mkString(" ")).toDF("doc_id", "text"),
      col("text"), n = 8))
    val ckpt = java.nio.file.Files.createTempDirectory("graft-spanlive-ckpt-")
    val ms = MemoryStream[(Long, String)]
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    def start() = graft.stream.Streamed.spanCutIngestLive(
      ms.toDF().toDF("doc_id", "text"), refIndex, "doc_id", col("text"),
      n = 8, checkpoint = ckpt.toString) { b =>
      val rows = b.select("doc_id", "n_tokens_cut").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      out.synchronized { out ++= rows }
    }
    val q1 = start()
    try {
      ms.addData(1L -> shared.mkString(" "),
        2L -> (1 to 12).map("d" + _).mkString(" "))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(out.synchronized(out.toSet) === Set((1L, 10L), (2L, 0L)),
      "shared doc fully cut, fresh doc untouched pre-restart")
    // restart against the same checkpoint: the committed batch must NOT
    // re-emit (offsets restored) and there is no stream state to
    // rebuild — the standing index carries everything
    val q2 = start()
    try {
      ms.addData(3L -> (shared ++ Seq("tail1", "tail2")).mkString(" "))
      q2.processAllAvailable()
      assert(q2.lastProgress == null || q2.lastProgress.stateOperators.isEmpty)
    } finally q2.stop()
    assert(out.synchronized(out.toSet) ===
      Set((1L, 10L), (2L, 0L), (3L, 10L)),
      "no re-emission of batch 1; post-restart doc cut against the index")
    org.apache.commons.io.FileUtils.deleteDirectory(ckpt.toFile)
    spark.sharedState.cacheManager.clearCache()
  }

  // --------------------------------------- self-updating standing index

  test("spanIndexIngestLive: live batch 2 is cut against batch 1's " +
      "SURVIVORS (q175's two-batch semantics, congruity-pinned), a " +
      "frozen index provably would not cut it; zero state operators") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val shared = (1 to 10).map("s" + _)
    val novel = (1 to 10).map("a" + _) // batch-1 survivor text
    val refDocs = Seq(0L -> shared.mkString(" ")).toDF("doc_id", "text")
    val base = java.nio.file.Files
      .createTempDirectory("graft-spanidx-live-")
    val indexDir = s"$base/idx"
    Dedup.spanIndexKeys(refDocs, col("text"), n = 8)
      .write.mode("overwrite").parquet(s"$indexDir/ref")
    // batch 1: doc 1 = shared prefix (cut by the reference) + the novel
    // tail (survives -> must enter the index); doc 3 fresh.
    // batch 2: doc 5 repeats the NOVEL run — it shares nothing with the
    // reference, so only the updated index can cut it (q175's split
    // rationale at stream granularity).
    val b1 = Seq(1L -> (shared ++ novel).mkString(" "),
      3L -> (1 to 12).map("d" + _).mkString(" "))
    val b2 = Seq(5L -> (novel ++ (1 to 9).map("z" + _)).mkString(" "))
    val ms = MemoryStream[(Long, String)]
    val out = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
    val q = graft.stream.Streamed.spanIndexIngestLive(
      ms.toDF().toDF("doc_id", "text"), indexDir, "doc_id", col("text"),
      n = 8, checkpoint = s"$base/ck") { b =>
      val rows = b.collect().map(_.toSeq)
      out.synchronized { out ++= rows }
    }
    try {
      ms.addData(b1: _*); q.processAllAvailable()
      ms.addData(b2: _*); q.processAllAvailable()
      val sp = q.lastProgress
      assert(sp == null || sp.stateOperators.isEmpty,
        "all cross-batch state lives in the persisted index")
    } finally q.stop()
    // the batch twin: q175's composition over the same two batches
    val refKeys = CacheScope.session.cache(
      Dedup.spanIndexKeys(refDocs, col("text"), n = 8))
    val b1cut = CacheScope.session.cache(Dedup.spanCutAgainstIndex(
      b1.toDF("doc_id", "text"), refKeys, "doc_id", col("text"), n = 8))
    val idx2 = refKeys.unionByName(
      Dedup.spanIndexAppend(refKeys, b1cut, col("dedup_text"), n = 8))
    val b2cut = Dedup.spanCutAgainstIndex(
      b2.toDF("doc_id", "text"), idx2, "doc_id", col("text"), n = 8)
    val twin = (b1cut.collect() ++ b2cut.collect()).map(_.toSeq).toSet
    assert(out.synchronized(out.toSet) === twin,
      "live two-batch feed == q175's batch composition")
    // the differential: doc 5 is cut ONLY because the index absorbed
    // batch 1's survivors — against the frozen reference it is intact
    assert(out.synchronized(out.exists(r => r(0) == 5L && r(3) == 10L)),
      "doc 5's novel-run tokens cut by the appended keys")
    val frozen = Dedup.spanCutAgainstIndex(b2.toDF("doc_id", "text"),
      refKeys, "doc_id", col("text"), n = 8).collect().map(_.toSeq)
    assert(frozen.forall(r => r(3) == 0L),
      "a frozen index would have admitted the repeat uncut")
    org.apache.commons.io.FileUtils.deleteDirectory(base.toFile)
    spark.sharedState.cacheManager.clearCache()
  }

  test("spanIndexIngestLive: the index append survives a checkpoint " +
      "kill EXACTLY ONCE (no duplicate b=<id> content, no re-emission; " +
      "post-restart batches cut against the appended keys)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val shared = (1 to 10).map("s" + _)
    val novel = (1 to 10).map("a" + _)
    val refDocs = Seq(0L -> shared.mkString(" ")).toDF("doc_id", "text")
    val base = java.nio.file.Files
      .createTempDirectory("graft-spanidx-restart-")
    val indexDir = s"$base/idx"
    Dedup.spanIndexKeys(refDocs, col("text"), n = 8)
      .write.mode("overwrite").parquet(s"$indexDir/ref")
    val ms = MemoryStream[(Long, String)]
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    def start() = graft.stream.Streamed.spanIndexIngestLive(
      ms.toDF().toDF("doc_id", "text"), indexDir, "doc_id", col("text"),
      n = 8, checkpoint = s"$base/ck") { b =>
      val rows = b.select("doc_id", "n_tokens_cut").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      out.synchronized { out ++= rows }
    }
    val q1 = start()
    try {
      ms.addData(1L -> (shared ++ novel).mkString(" "))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(out.synchronized(out.toSet) === Set((1L, 10L)))
    def appendDirs() = new java.io.File(indexDir).listFiles()
      .map(_.getName).filter(_.startsWith("b=")).toSet
    assert(appendDirs() === Set("b=0"), "batch 1's append landed once")
    val keysAfterB1 = spark.read
      .option("recursiveFileLookup", "true").parquet(indexDir).count()
    // restart against the same checkpoint: the committed batch must not
    // re-emit OR re-append; the new batch repeats batch 1's survivor
    // run and must be cut by the appended keys
    val q2 = start()
    try {
      ms.addData(5L -> (novel ++ (1 to 9).map("z" + _)).mkString(" "))
      q2.processAllAvailable()
      assert(q2.lastProgress == null ||
        q2.lastProgress.stateOperators.isEmpty)
    } finally q2.stop()
    assert(out.synchronized(out.toSet) === Set((1L, 10L), (5L, 10L)),
      "no re-emission; the post-restart batch is cut by batch 1's keys")
    assert(appendDirs() === Set("b=0", "b=1"))
    val b0Again = spark.read.parquet(s"$indexDir/b=0").count()
    assert(keysAfterB1 === spark.read
      .option("recursiveFileLookup", "true").parquet(s"$indexDir/ref")
      .count() + b0Again, "b=0 holds exactly one append's keys")
    org.apache.commons.io.FileUtils.deleteDirectory(base.toFile)
    spark.sharedState.cacheManager.clearCache()
  }

  test("vectorCorpusIngestLive: batch 2 drops against reference UNION " +
      "batch-1 survivors (q176's two-batch semantics); a frozen " +
      "reference would re-admit the near-dup; zero state operators") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val base = java.nio.file.Files
      .createTempDirectory("graft-veccorpus-live-")
    val corpusDir = s"$base/corpus"
    val r0 = Seq(0.99f, 0.1f, 0f, 0f)
    val v1 = Seq(0f, 1f, 0f, 0f)        // batch-1 novel survivor
    val v2 = Seq(1f, 0.05f, 0f, 0f)     // ≈ r0 -> dropped in batch 1
    val v3 = Seq(0.05f, 0.99f, 0.1f, 0f) // ≈ v1 -> dropped ONLY if v1 admitted
    val v4 = Seq(0f, 0f, 1f, 0f)        // novel in batch 2
    Seq((0L, r0)).toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$corpusDir/ref")
    val ms = MemoryStream[(Long, Seq[Float])]
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = graft.stream.Streamed.vectorCorpusIngestLive(
      ms.toDF().toDF("vec_id", "embedding"), corpusDir, "vec_id",
      "embedding", signBits = 4, threshold = 0.9, maxBucket = 0L,
      probes = 2, checkpoint = s"$base/ck") { b =>
      val ids = b.select("vec_id").collect().map(_.getLong(0))
      out.synchronized { out ++= ids }
    }
    try {
      ms.addData(1L -> v1, 2L -> v2); q.processAllAvailable()
      ms.addData(3L -> v3, 4L -> v4); q.processAllAvailable()
      val sp = q.lastProgress
      assert(sp == null || sp.stateOperators.isEmpty,
        "the growing corpus dir is the only cross-batch state")
    } finally q.stop()
    assert(out.synchronized(out.toSet) === Set(1L, 4L),
      "v2 dropped by the reference; v3 dropped by ADMITTED v1; v4 kept")
    // congruity with q176's batch composition over the same split
    val ref = Seq((0L, r0)).toDF("vec_id", "embedding")
    val b1 = Seq((1L, v1), (2L, v2)).toDF("vec_id", "embedding")
    val b2 = Seq((3L, v3), (4L, v4)).toDF("vec_id", "embedding")
    val s1 = CacheScope.session.cache(Dedup.dropNearDupsAgainst(b1,
      "vec_id", Dedup.cosineMatchedAgainst(b1, ref, "vec_id",
        col("embedding"), signBits = 4, threshold = 0.9, probes = 2)))
    val s2 = Dedup.dropNearDupsAgainst(b2, "vec_id",
      Dedup.cosineMatchedAgainst(b2, ref.unionByName(s1), "vec_id",
        col("embedding"), signBits = 4, threshold = 0.9, probes = 2))
    val twin = (s1.collect() ++ s2.collect()).map(_.getLong(0)).toSet
    assert(out.synchronized(out.toSet) === twin)
    // the frozen-reference control: without the growth v3 is re-admitted
    val frozen = Dedup.dropNearDupsAgainst(b2, "vec_id",
      Dedup.cosineMatchedAgainst(b2, ref, "vec_id", col("embedding"),
        signBits = 4, threshold = 0.9, probes = 2))
      .collect().map(_.getLong(0)).toSet
    assert(frozen === Set(3L, 4L),
      "a frozen reference would re-admit the near-dup of an admitted doc")
    // and the corpus dir grew by exactly the survivors
    val grown = spark.read.option("recursiveFileLookup", "true")
      .parquet(corpusDir).select("vec_id").collect()
      .map(_.getLong(0)).toSet
    assert(grown === Set(0L, 1L, 4L))
    org.apache.commons.io.FileUtils.deleteDirectory(base.toFile)
    spark.sharedState.cacheManager.clearCache()
  }

  // ------------------------------------------------- composed live ingest

  private def liveCurationFixture = {
    val r = (1 to 15).map("r" + _)
    val m = (1 to 7).map("m" + _)
    val refDocs = Seq(0L -> r.mkString(" "), 2L -> m.mkString(" "))
      .toDF("doc_id", "text")
    val refIndex = CacheScope.session.cache(
      Dedup.spanIndexKeys(refDocs, col("text"), n = 8))
    val refSigs = CacheScope.session.cache(
      Dedup.minHashSignatures(refDocs, "doc_id", col("text"), n = 3, k = 8))
    // (doc_id, text, n_chars, source): 1 = span-cut survivor (ref
    // prefix cut, own tail kept), 3 = exact near-dup of ref 2 (under 8
    // tokens - survives span, dropped by minhash-against), 5 = fresh,
    // 7 = gate-failed, 9 = fully span-cut (kept 0 < minKept), 11/13/15
    // = fresh source-b fillers for the quota
    val rows = Seq(
      (1L, (r ++ (1 to 6).map("x" + _)).mkString(" "), 50L, "a"),
      (3L, m.mkString(" "), 50L, "a"),
      (5L, (1 to 10).map("y" + _).mkString(" "), 50L, "a"),
      (7L, (1 to 10).map("g" + _).mkString(" "), 1L, "a"),
      (9L, r.mkString(" "), 50L, "b"),
      (11L, (1 to 5).map("z" + _).mkString(" "), 50L, "b"),
      (13L, (1 to 5).map("w" + _).mkString(" "), 50L, "b"),
      (15L, (1 to 5).map("v" + _).mkString(" "), 50L, "b"))
    (refDocs, refIndex, refSigs, rows)
  }

  /** The batch composition the live chain must equal - gate, span-cut
    * against the index, survivor floor, minhash-against drop. */
  private def liveCurationBatchTwin(inc: org.apache.spark.sql.DataFrame,
      refIndex: org.apache.spark.sql.DataFrame,
      refSigs: org.apache.spark.sql.DataFrame) = {
    val gated = inc.filter(col("n_chars") >= 5L)
    val cut = Dedup.spanCutAgainstIndex(gated, refIndex, "doc_id",
      col("text"), n = 8)
    val surv = cut.filter(col("n_tokens_kept") >= 2L)
      .join(gated.select(col("doc_id"), col("source")), "doc_id")
    val matched = Dedup.minhashMatchedAgainst(
      Dedup.minHashSignatures(surv, "doc_id", col("dedup_text"),
        n = 3, k = 8),
      refSigs, "doc_id", k = 8, rowsPerBand = 4, threshold = 0.5)
    Dedup.dropNearDupsAgainst(surv, "doc_id", matched)
  }

  test("curationIngestLive: live survivors == the batch composition " +
      "across batch splits with the quota open; the front is " +
      "STATELESS and the quota stage holds exactly ONE state operator") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val (_, refIndex, refSigs, rows) = liveCurationFixture
    val base = java.nio.file.Files.createTempDirectory("graft-curlive-")
    val ms = MemoryStream[(Long, String, Long, String)]
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, String, Long)]
    val (front, capQ) = graft.stream.Streamed.curationIngestLive(
      ms.toDF().toDF("doc_id", "text", "n_chars", "source"),
      refIndex, refSigs, gate = col("n_chars") >= 5L, minKept = 2L,
      spanN = 8, sigN = 3, sigK = 8, rowsPerBand = 4, threshold = 0.5,
      maxBucket = 0L, capN = 100L,
      stagingDir = s"$base/staging", ckptFront = s"$base/ckA",
      ckptCap = s"$base/ckB") { b =>
      val rs = b.collect().map(r =>
        (r.key, r.value._1, r.value._2, r.value._3))
      out.synchronized { out ++= rs }
    }
    try {
      // the batch split straddles the span-cut survivor and the
      // near-dup drop - stage congruity must hold across it
      ms.addData(rows.take(4): _*); front.processAllAvailable()
      capQ.processAllAvailable()
      ms.addData(rows.drop(4): _*); front.processAllAvailable()
      capQ.processAllAvailable()
      val fp = front.lastProgress
      assert(fp == null || fp.stateOperators.isEmpty,
        "front must be stateless - the standing structures carry it all")
      assert(capQ.lastProgress.stateOperators.length === 1,
        "the quota counter is the composition's ONLY state operator")
    } finally { front.stop(); capQ.stop() }
    val twin = liveCurationBatchTwin(
      rows.toDF("doc_id", "text", "n_chars", "source"), refIndex, refSigs)
      .select(col("source"), col("doc_id"), col("dedup_text"),
        col("n_tokens_kept"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3))).toSet
    assert(out.synchronized(out.toSet) === twin)
    assert(twin.map(_._2) === Set(1L, 5L, 11L, 13L, 15L),
      "fixture sanity: gate, span floor and near-dup drop each bit")
    org.apache.commons.io.FileUtils.deleteDirectory(base.toFile)
    spark.sharedState.cacheManager.clearCache()
  }

  test("curationIngestLive with spanIndexDir: live batch 2 span-cuts " +
      "against batch 1's ADMITTED survivors (q175 composed into the " +
      "curation front); the frozen form provably admits it uncut") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val shared = (1 to 15).map("r" + _)
    val novel = (1 to 10).map("a" + _)
    val refDocs = Seq(0L -> shared.mkString(" ")).toDF("doc_id", "text")
    val refIndex = CacheScope.session.cache(
      Dedup.spanIndexKeys(refDocs, col("text"), n = 8))
    val refSigs = CacheScope.session.cache(
      Dedup.minHashSignatures(refDocs, "doc_id", col("text"), n = 3, k = 8))
    val base = java.nio.file.Files
      .createTempDirectory("graft-curlive-upd-")
    val indexDir = s"$base/idx"
    refIndex.write.mode("overwrite").parquet(s"$indexDir/ref")
    // batch 1: doc 1 = ref prefix + novel tail -> admitted with
    // dedup_text = the novel run, which must enter the index
    // batch 2: doc 5 repeats the novel run + its own tail — only the
    // UPDATED index cuts it (it shares nothing with the reference)
    val b1 = Seq((1L, (shared ++ novel).mkString(" "), 50L, "a"))
    val b2 = Seq((5L, (novel ++ (1 to 9).map("z" + _)).mkString(" "), 50L, "a"))
    val ms = MemoryStream[(Long, String, Long, String)]
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
    val (front, capQ) = graft.stream.Streamed.curationIngestLive(
      ms.toDF().toDF("doc_id", "text", "n_chars", "source"),
      refIndex, refSigs, gate = col("n_chars") >= 5L, minKept = 2L,
      spanN = 8, sigN = 3, sigK = 8, rowsPerBand = 4, threshold = 0.5,
      maxBucket = 0L, capN = 100L,
      stagingDir = s"$base/staging", ckptFront = s"$base/ckA",
      ckptCap = s"$base/ckB", spanIndexDir = indexDir) { b =>
      val rs = b.collect().map(r => (r.value._1, r.value._2, r.value._3))
      out.synchronized { out ++= rs }
    }
    try {
      ms.addData(b1: _*); front.processAllAvailable()
      capQ.processAllAvailable()
      ms.addData(b2: _*); front.processAllAvailable()
      capQ.processAllAvailable()
      val fp = front.lastProgress
      assert(fp == null || fp.stateOperators.isEmpty,
        "the growing index is persisted state, not stream state")
    } finally { front.stop(); capQ.stop() }
    val got = out.synchronized(out.map(r => r._1 -> ((r._2, r._3))).toMap)
    // doc 1: ref prefix cut, novel tail kept (10 tokens)
    assert(got(1L) === ((novel.mkString(" "), 10L)))
    // doc 5: the novel run cut by batch 1's ABSORBED survivor keys —
    // only the z-tail survives
    assert(got(5L) === (((1 to 9).map("z" + _).mkString(" "), 9L)))
    // frozen-index control (the pre-r20 behavior): doc 5 fully intact
    val frozenCut = Dedup.spanCutAgainstIndex(
      Seq(5L -> (novel ++ (1 to 9).map("z" + _)).mkString(" "))
        .toDF("doc_id", "text"),
      refIndex, "doc_id", col("text"), n = 8).collect().head
    assert(frozenCut.getAs[Long]("n_tokens_cut") === 0L,
      "the frozen front would have admitted the repeat uncut")
    // and the index absorbed exactly the two admitted batches
    assert(new java.io.File(indexDir).listFiles().map(_.getName)
      .filter(_.startsWith("b=")).toSet === Set("b=0", "b=1"))
    org.apache.commons.io.FileUtils.deleteDirectory(base.toFile)
    spark.sharedState.cacheManager.clearCache()
  }

  test("curationIngestLive: a binding quota admits first-n per source " +
      "EXACTLY across batch splits and a full restart (the counter is " +
      "the one piece of stream state)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val (_, refIndex, refSigs, rows) = liveCurationFixture
    val base = java.nio.file.Files.createTempDirectory("graft-curlive2-")
    val ms = MemoryStream[(Long, String, Long, String)]
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    def start() = graft.stream.Streamed.curationIngestLive(
      ms.toDF().toDF("doc_id", "text", "n_chars", "source"),
      refIndex, refSigs, gate = col("n_chars") >= 5L, minKept = 2L,
      spanN = 8, sigN = 3, sigK = 8, rowsPerBand = 4, threshold = 0.5,
      maxBucket = 0L, capN = 2L,
      stagingDir = s"$base/staging", ckptFront = s"$base/ckA",
      ckptCap = s"$base/ckB") { b =>
      val rs = b.collect().map(r => (r.key, r.value._1))
      out.synchronized { out ++= rs }
    }
    val (f1, c1) = start()
    try {
      ms.addData(rows.take(4): _*) // source a: survivors 1, 5
      f1.processAllAvailable(); c1.processAllAvailable()
      ms.addData(rows.slice(4, 7): _*) // 9 dropped; 11, 13 admitted (b)
      f1.processAllAvailable(); c1.processAllAvailable()
    } finally { f1.stop(); c1.stop() }
    assert(out.synchronized(out.toSet) ===
      Set(("a", 1L), ("a", 5L), ("b", 11L), ("b", 13L)))
    // full restart from both checkpoints: source b's counter is at its
    // quota, so the post-restart b survivor must be REJECTED - and
    // nothing re-emits
    val (f2, c2) = start()
    try {
      ms.addData(rows.drop(7): _*) // doc 15, source b - over quota
      f2.processAllAvailable(); c2.processAllAvailable()
      assert(c2.lastProgress == null ||
        c2.lastProgress.stateOperators.length <= 1)
    } finally { f2.stop(); c2.stop() }
    assert(out.synchronized(out.toSet) ===
      Set(("a", 1L), ("a", 5L), ("b", 11L), ("b", 13L)),
      "the restarted counter rejects over-quota arrivals; no re-emission")
    org.apache.commons.io.FileUtils.deleteDirectory(base.toFile)
    spark.sharedState.cacheManager.clearCache()
  }

  // ---------------------------------------------------------------- //
  //  Vocabulary top-K                                                 //
  // ---------------------------------------------------------------- //

  test("vocabTopK: per-group counts, heap order (cnt desc, hash60 asc), empty tokens excluded") {
    val docs = Seq(
      ("en", "a a a b b c"),
      ("en", "b  c"), // double space → one empty token, excluded
      ("de", "x y x")).toDF("lang", "text")
    val got = TextAnalysis.vocabTopK(docs, "lang", col("text"), k = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    // en: a=3, b=3 (tie → hash60 order), c=2; de: x=2, y=1
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(md.digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15), 16)
    }
    val enTie = Seq("a", "b").sortBy(h60)
    assert(got == Set(
      ("en", enTie(0), 3L, 1L), ("en", enTie(1), 3L, 2L),
      ("de", "x", 2L, 1L), ("de", "y", 1L, 2L)))
  }

  test("distinguishingTokens: group-unique token outranks a more frequent shared one") {
    // "the" is everywhere (df=3, weight 1); each group's marker token is
    // unique (df=1, weight 3) and outranks it despite lower tf
    val docs = Seq(
      ("a", "the the the alpha alpha"),
      ("b", "the the the beta"),
      ("c", "the the gamma gamma gamma gamma")).toDF("g", "text")
    val got = TextAnalysis.distinguishingTokens(docs, "g", col("text"), k = 1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    // scores: alpha 2·3=6 vs the 3·1=3; beta 1·3=3 vs the 3·1=3 (tie →
    // hash60 order decides); gamma 4·3=12
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(md.digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15), 16)
    }
    val bTop = Seq("beta", "the").sortBy(h60).head
    val bRow = if (bTop == "beta") ("b", 1L, "beta", 1L, 1L, 3L)
      else ("b", 1L, "the", 3L, 3L, 3L)
    assert(got == Set(
      ("a", 1L, "alpha", 2L, 1L, 6L), bRow,
      ("c", 1L, "gamma", 4L, 1L, 12L)))
  }

  test("vocabTopK: k larger than the vocabulary returns the whole vocabulary ranked") {
    val docs = Seq(("en", "p q p")).toDF("lang", "text")
    val got = TextAnalysis.vocabTopK(docs, "lang", col("text"), k = 10)
      .orderBy("rank").collect().map(r => (r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq("p" -> 2L, "q" -> 1L))
  }

  // ---------------------------------------------------------------- //
  //  Leakage-safe splits                                              //
  // ---------------------------------------------------------------- //

  test("leakageSafeSplit: connected near-dups share a split; singletons match hashSplit on own id") {
    import graft.ops.Sampling
    val ids = (0L until 40L).toDF("doc_id")
    // one 3-chain (0≈1≈2) + one pair (10≈11); the rest are singletons
    val pairs = Seq((0L, 1L), (1L, 2L), (10L, 11L)).toDF("a", "b")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = Sampling.leakageSafeSplit(ids, "doc_id", pairs, splits, "s9")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out.size == 40)
    assert(Seq(0L, 1L, 2L).map(out(_)).distinct.size == 1,
      "the whole 3-chain lands in one (cluster, split)")
    assert(out(10L) == out(11L))
    assert(out(0L)._1 == 0L && out(10L)._1 == 10L, "cluster = min member id")
    // singletons: cluster is the own id, so the assignment IS hashSplit's
    val hs = Sampling.hashSplit((12L until 40L).toDF("doc_id"), "doc_id",
      splits, "s9").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    (12L until 40L).foreach(i => assert(out(i) == (i -> hs(i)), s"doc $i"))
  }

  // ---------------------------------------------------------------- //
  //  Chunk windows + label centroids                                  //
  // ---------------------------------------------------------------- //

  test("chunkWindows: overlap, tail coverage, short docs, empty text excluded") {
    val docs = Seq(
      (1L, "a b c d e f g"), // 7 tokens, chunk 4 stride 2 → starts 0,2,4 (ceil(3/2)+1=3)
      (2L, "x y"), // shorter than one chunk → 1 window
      (3L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.chunkWindows(docs, "doc_id", col("text"),
      chunkTokens = 4, strideTokens = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getString(3), r.getLong(4))).toMap
    assert(got == Map(
      (1L, 0L) -> (0L, "a b c d", 4L),
      (1L, 1L) -> (2L, "c d e f", 4L),
      (1L, 2L) -> (4L, "e f g", 3L), // tail window short but covers g
      (2L, 0L) -> (0L, "x y", 2L)))
    // every token of doc 1 appears in at least one chunk
    val covered = got.collect { case ((1L, _), (_, t, _)) => t.split(" ") }
      .flatten.toSet
    assert(covered == Set("a", "b", "c", "d", "e", "f", "g"))
  }

  test("property: chunkWindows covers every token, respects stride/size bounds (4 seeds)") {
    for (seed <- 51 to 54) {
      val rnd = new scala.util.Random(seed)
      val chunk = 2 + rnd.nextInt(6)
      val stride = 1 + rnd.nextInt(chunk)
      val docs = (1L to 20L).map { id =>
        id -> Seq.fill(1 + rnd.nextInt(25))("t" + rnd.nextInt(50)).mkString(" ")
      }
      val got = TextAnalysis.chunkWindows(docs.toDF("doc_id", "text"),
        "doc_id", col("text"), chunk, stride)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3), r.getLong(4)))
      val byDoc = got.groupBy(_._1)
      docs.foreach { case (id, text) =>
        val toks = text.split(" ").toSeq
        val ws = byDoc(id).sortBy(_._2)
        // indices contiguous from 0; starts advance by exactly stride
        assert(ws.map(_._2).toSeq == ws.indices.map(_.toLong))
        ws.foreach { case (_, i, start, t, n) =>
          assert(start == i * stride)
          val expect = toks.slice(start.toInt, start.toInt + chunk)
          assert(t == expect.mkString(" ") && n == expect.size,
            s"seed=$seed doc=$id win=$i")
        }
        // full coverage and no redundant tail: last start < nTokens,
        // last window reaches the final token
        assert(ws.last._3 < toks.size)
        assert(ws.last._3 + ws.last._5 == toks.size,
          s"seed=$seed doc=$id: last window must end at the last token")
      }
    }
  }

  test("property: vocabTopK == driver-side recount with the hash60 tie order (4 seeds)") {
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(md.digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15), 16)
    }
    for (seed <- 61 to 64) {
      val rnd = new scala.util.Random(seed)
      val langs = Seq("en", "de")
      val docs = (1 to 40).map { _ =>
        (langs(rnd.nextInt(2)),
          Seq.fill(3 + rnd.nextInt(10))("w" + rnd.nextInt(12)).mkString(" "))
      }
      val k = 1 + rnd.nextInt(5)
      val got = TextAnalysis.vocabTopK(docs.toDF("lang", "text"), "lang",
        col("text"), k)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3))).toSet
      val want = docs.groupBy(_._1).flatMap { case (lang, ds) =>
        val counts = ds.flatMap(_._2.split(" ")).filter(_.nonEmpty)
          .groupBy(identity).map { case (t, o) => t -> o.size.toLong }
        counts.toSeq.sortBy { case (t, c) => (-c, h60(t)) }.take(k)
          .zipWithIndex.map { case ((t, c), i) => (lang, t, c, (i + 1).toLong) }
      }.toSet
      assert(got == want, s"seed=$seed k=$k")
    }
  }

  test("centroidByGroup: exact int8 component sums, null vectors counted not summed") {
    val df = Seq(
      (1L, "g1", Seq(1f, -1f)), // quantizes to (127, -127)
      (2L, "g1", Seq(0.5f, 1f)), // scale 1 → (64, 127): round(63.5) HALF_UP = 64
      (3L, "g2", Seq(2f, 0f)), // (127, 0)
      (4L, "g2", null)).toDF("vec_id", "g", "embedding")
    val got = Similarity.centroidByGroup(df, "g", "embedding")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getSeq[Long](3).toList)).toMap
    assert(got == Map(
      "g1" -> (2L, 0L, List(191L, 0L)),
      "g2" -> (1L, 1L, List(127L, 0L))))
  }

  // ---------------------------------------------------------------- //
  //  Filter funnel                                                    //
  // ---------------------------------------------------------------- //

  test("filterFunnel: first failing rule wins, kept iff all pass, counts add up") {
    import graft.ops.Curation
    val docs = Seq(
      (1L, 10L), // fails r1 AND r2 → charged to r1 (pipeline order)
      (2L, 60L), // fails r2 only
      (3L, 200L) // passes both
    ).toDF("doc_id", "n")
    val rules = Seq(
      "ge50" -> (col("n") >= 50L),
      "ge100" -> (col("n") >= 100L))
    val out = Curation.filterFunnel(docs, "doc_id", rules)
      .collect().map(r => r.getLong(0) ->
        (Option(r.getString(2)), r.getBoolean(3))).toMap
    assert(out == Map(
      1L -> (Some("ge50"), false),
      2L -> (Some("ge100"), false),
      3L -> (None, true)))
    val counts = Curation.funnelCounts(docs, "doc_id", rules)
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(counts == Map(Some("ge50") -> 1L, Some("ge100") -> 1L, None -> 1L))
    assert(counts.values.sum == 3L, "every doc is attributed exactly once")
  }

  test("filterFunnel rejects duplicate rule names") {
    import graft.ops.Curation
    val e = intercept[IllegalArgumentException] {
      Curation.filterFunnel(Seq((1L, 1L)).toDF("doc_id", "n"), "doc_id",
        Seq("r" -> (col("n") > 0), "r" -> (col("n") < 0)))
    }
    assert(e.getMessage.contains("duplicate rule names"))
  }

  // ---------------------------------------------------------------- //
  //  Keep-best dedup + per-group cap                                  //
  // ---------------------------------------------------------------- //

  test("dropNearDupsKeeping: longest member survives per cluster, ties to lowest id") {
    val df = Seq(
      (0L, 10L), (1L, 30L), (2L, 30L), // chain 0-1-2: 1 and 2 tie on score → 1
      (10L, 5L), (11L, 9L), // pair: 11 longer
      (20L, 1L) // singleton
    ).toDF("doc_id", "n_chars")
    val pairs = Seq((0L, 1L), (1L, 2L), (10L, 11L)).toDF("a", "b")
    val got = Dedup.dropNearDupsKeeping(df, "doc_id", pairs, "n_chars")
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L, 11L, 20L))
    // contrast: the min-id keeper would keep 0 and 10
    val minId = Dedup.dropNearDups(df, "doc_id", pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(minId == Set(0L, 10L, 20L))
  }

  test("capPerGroupWeighted: exactly-n, driver-side priority parity, weight bias, null/zero weights excluded") {
    import graft.ops.Sampling
    val rnd = new scala.util.Random(17)
    val rows = (0L until 200L).map(i =>
      (i, "g" + (i % 2), if (i % 50 == 0) 0L else 1L + rnd.nextInt(9)))
    val df = rows.toDF("doc_id", "source", "w")
    val got = Sampling.capPerGroupWeighted(df, "source", "doc_id",
      col("w"), n = 20, seed = "pw1")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got.groupBy(_._2).view.mapValues(_.size).toMap ==
      Map("g0" -> 20, "g1" -> 20))
    // driver-side re-derivation of the priority order (w/u, exact)
    def h52(seed: String, id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(md.digest(s"$seed$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15), 16) % (1L << 52)
    }
    val want = rows.filter(_._3 > 0).groupBy(_._2).flatMap { case (g, rs) =>
      rs.sortBy { case (id, _, w) =>
        (-(w.toDouble / ((h52("pw1", id) + 1).toDouble / (1L << 52).toDouble)), id)
      }.take(20).map(r => (r._1, g))
    }.toSet
    assert(got == want, "membership == driver-side priority sampling")
    // weight bias: weight-10 rows survive far more often than weight-1
    // rows across seeds (priority ∝ w/u)
    val biased = (0L until 400L).map(i => (i, "g", if (i < 200) 10L else 1L))
      .toDF("doc_id", "source", "w")
    val heavyKept = (1 to 5).map { s =>
      Sampling.capPerGroupWeighted(biased, "source", "doc_id", col("w"),
        n = 100, seed = s"b$s").filter(col("doc_id") < 200).count()
    }.sum
    assert(heavyKept > 5 * 70,
      s"10x-weight rows should dominate the kept set, got $heavyKept/500")
    // zero-weight rows never survive even in an under-full group
    val zeros = Seq((1L, "z", 0L), (2L, "z", 5L)).toDF("doc_id", "source", "w")
    assert(Sampling.capPerGroupWeighted(zeros, "source", "doc_id",
      col("w"), n = 10, seed = "z").select("doc_id").as[Long].collect().toSeq
      == Seq(2L))
  }

  test("dropRepeatsWithin: chained bursts, quiet-horizon revival, per-key independence") {
    val h = 100L
    val df = Seq(
      // key a: burst at 0,60,120 (chained 60-gaps) -> keep 0 only;
      // quiet 150 -> 270 starts a new burst; 300 within 30 -> drop
      ("a", 0L, 1L), ("a", 60L, 2L), ("a", 120L, 3L),
      ("a", 270L, 4L), ("a", 300L, 5L),
      // key b: two sightings exactly horizon apart: 100 - 0 <= 100 -> repeat
      ("b", 0L, 6L), ("b", 100L, 7L), ("b", 201L, 8L))
      .toDF("k", "ts_us", "oid")
    val got = graft.ops.Dedup.dropRepeatsWithin(df, "k", "ts_us", "oid",
      horizonUs = h).select("oid").as[Long].collect().toSet
    assert(got == Set(1L, 4L, 6L, 8L))
  }

  test("budgetFill: greedy prefix by (score desc, id), running spent, non-positive costs out") {
    import graft.ops.Sampling
    val df = Seq(
      // group g, budget 100: scores rank 5,4,3(tie->id),2; costs 60,30,20
      (1L, "g", 5L, 60L), (2L, "g", 4L, 30L),
      (3L, "g", 3L, 20L), (4L, "g", 3L, 50L), // tie: id 3 before 4
      (5L, "g", 2L, 1L),  // would fit, but 4 overflowed first -> prefix cut
      (6L, "h", 1L, 100L), // exactly the budget
      (7L, "h", 9L, 0L))   // zero cost: excluded by contract
      .toDF("doc_id", "grp", "score", "cost")
    val got = Sampling.budgetFill(df, "grp", "doc_id", "score", "cost",
      budget = 100L)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    // g: 60, then 90; id 3 overflows at 110 and the prefix stops — the
    // cheap id 5 does NOT sneak in. h: exactly-budget row survives.
    assert(got == Map(1L -> 60L, 2L -> 90L, 6L -> 100L))
  }

  test("sampleExactN: exact n, deterministic, append-stable unless displaced") {
    import graft.ops.Sampling
    val df = (0L until 500L).map(i => (i, "p" + i)).toDF("doc_id", "v")
    val a = Sampling.sampleExactN(df, "doc_id", n = 50, seed = "e1")
      .select("doc_id").as[Long].collect().toSet
    assert(a.size == 50)
    assert(a == Sampling.sampleExactN(df, "doc_id", n = 50, seed = "e1")
      .select("doc_id").as[Long].collect().toSet, "re-run stable")
    // driver-side contract: the 50 smallest salted 52-bit hashes
    def h52(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(md.digest(s"e1$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15), 16) % (1L << 52)
    }
    assert(a == (0L until 500L).sortBy(id => (h52(id), id)).take(50).toSet)
    // appending rows only displaces members whose hash is beaten
    val bigger = (0L until 800L).map(i => (i, "p" + i)).toDF("doc_id", "v")
    val b = Sampling.sampleExactN(bigger, "doc_id", n = 50, seed = "e1")
      .select("doc_id").as[Long].collect().toSet
    assert(b == (0L until 800L).sortBy(id => (h52(id), id)).take(50).toSet)
    assert((a intersect b) == b.filter(_ < 500L), "old members persist unless out-hashed")
  }

  test("percentileGate: percentile_disc cut per group, RANGE peers counted, null values dropped") {
    import graft.ops.Sampling
    val df = ((1L to 8L).map(i => (i, "g", i)) ++ // values 1..8, one each
      Seq((11L, "h", 1L), (12L, "h", 1L), (13L, "h", 1L), (14L, "h", 4L)))
      .toDF("doc_id", "source", "v")
    // bottom quartile of g: cum >= 8*0.25 = 2 -> thr 2; values >= 2 survive
    val got = Sampling.percentileGate(df, "source", "v", bp = 2500)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("__thr")).toMap
    assert(got.keySet.filter(_ <= 8L) == (2L to 8L).toSet)
    assert(got(2L) == 2L)
    // h at bp=2500: value 1 has cum 3 >= 1 -> thr 1, all of h survives
    assert(got.keySet.filter(_ > 8L) == Set(11L, 12L, 13L, 14L))
    // median cut with peers: value 1's cum (3, RANGE counts peers)
    // reaches 4*0.5 = 2 at value 1 -> thr 1, everything survives
    val med = Sampling.percentileGate(df.filter(col("source") === "h"),
      "source", "v", bp = 5000).count()
    assert(med == 4)
    // a null value never survives and doesn't shift the histogram
    val withNull = df.unionByName(Seq((99L, "g", Option.empty[Long]))
      .toDF("doc_id", "source", "v"))
    val g2 = Sampling.percentileGate(withNull, "source", "v", bp = 2500)
      .filter(col("source") === "g").select("doc_id").as[Long].collect().toSet
    assert(g2 == (2L to 8L).toSet)
  }

  test("capPerGroup: exactly n survive per overfull group, membership deterministic and seed-dependent") {
    import graft.ops.Sampling
    val df = (0L until 100L).map(i => (i, "g" + (i % 2))).toDF("doc_id", "source")
    val a = Sampling.capPerGroup(df, "source", "doc_id", n = 10, seed = "s1")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a.groupBy(_._2).view.mapValues(_.size).toMap ==
      Map("g0" -> 10, "g1" -> 10))
    // deterministic: same seed → same members
    val a2 = Sampling.capPerGroup(df, "source", "doc_id", n = 10, seed = "s1")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a == a2)
    // a different seed picks a different subset (overwhelmingly)
    val b = Sampling.capPerGroup(df, "source", "doc_id", n = 10, seed = "s2")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a != b)
    // under-full groups survive whole
    val small = Sampling.capPerGroup(df, "source", "doc_id", n = 60, seed = "s1")
    assert(small.count() == 100)
    // the survivors are the n smallest 52-bit salted hashes — the
    // documented contract, recomputed driver-side
    def h52(seed: String, id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(md.digest(s"$seed$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15), 16) % (1L << 52)
    }
    val want = (0L until 100L).groupBy(i => "g" + (i % 2)).flatMap {
      case (g, ids) => ids.sortBy(i => (h52("s1", i), i)).take(10).map((_, g))
    }.toSet
    assert(a == want)
  }

  test("stratifiedExactN: largest-remainder quotas, exact n overall, hash-rank membership") {
    import graft.ops.Sampling
    def h52(seed: String, id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(md.digest(s"$seed$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15), 16) % (1L << 52)
    }
    // sizes A=10 B=6 C=4 (N=20), n=7: shares 3.5/2.1/1.4 → base 3/2/1,
    // remainders (×N) 10/2/8 → the 1 leftover seat goes to A → 4/2/1
    val rows = (0L until 10L).map(i => (i, "A")) ++
      (10L until 16L).map(i => (i, "B")) ++ (16L until 20L).map(i => (i, "C"))
    val df = rows.toDF("doc_id", "source")
    val got = Sampling.stratifiedExactN(df, "source", "doc_id",
        n = 7, seed = "st1")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == 7, "exactly n overall")
    val bySrc = got.groupBy(_._2).view.mapValues(_.keys.toSet).toMap
    assert(bySrc.view.mapValues(_.size).toMap ==
      Map("A" -> 4, "B" -> 2, "C" -> 1))
    val want = rows.groupBy(_._2).map { case (g, ids) =>
      g -> ids.map(_._1).sortBy(i => (h52("st1", i), i))
        .take(Map("A" -> 4, "B" -> 2, "C" -> 1)(g)).toSet
    }
    assert(bySrc == want, "membership = ascending salted hash per group")
    // n >= N degrades to keeping everything
    assert(Sampling.stratifiedExactN(df, "source", "doc_id",
      n = 25, seed = "st1").count() == 20)
  }
}
