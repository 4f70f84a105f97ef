package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Dedup, TextAnalysis}

/** The codegen text expressions (FoldHash, MarkerCountSum, LangIdExpr)
  * must match the Column forms they replaced — the replace-trick counts
  * and the HOF fingerprint fold — bit-for-bit, since the DuckDB oracles
  * still mirror those original forms. */
class TextExprSpec extends AnyFunSuite {

  import TestKit._
  import spark.implicits._

  private def docs = Seq(
    (1L, "the cat and the dog is on the mat"),
    (2L, "el gato y la casa es los perros"),
    (3L, "der hund und die katze ist hier"),
    (4L, "le chat et les chiens est la"),
    (5L, "这是的一个测试了是的"),
    (6L, ""),
    (7L, "   "),
    (8L, "a  b   c"),
    (9L, "the the the the"),
    (10L, "is is is and and of of of the"),
    (11L, "word"),
    (12L, "the la der le 的 mixed is es ist est 是"))
    .toDF("doc_id", "text")

  // --- original Column forms, reproduced for comparison ---------------- //

  private def occurrences(t: Column, w: String): Column =
    ((length(t) - length(replace(t, lit(w), lit("")))) / w.length).cast("long")

  private def langScoreOld(text: Column, markers: Seq[String]): Column = {
    val padded = concat(lit(" "), text, lit(" "))
    markers.map(m => occurrences(padded, m)).reduce(_ + _)
  }

  private def langIdOld(text: Column): Column = {
    val scores = TextAnalysis.LangMarkers.map { case (l, ms) =>
      l -> langScoreOld(text, ms) }
    val best = scores.tail.foldLeft(scores.head._2)((b, s) => greatest(b, s._2))
    scores.foldRight(lit("und"): Column) { case ((l, s), els) =>
      when(s > 0 && s === best, lit(l)).otherwise(els)
    }
  }

  private def fingerprintOld(text: Column): Column =
    aggregate(
      transform(split(text, " "), w => Dedup.hash60(w) % TextAnalysis.FpP),
      lit(0L),
      (acc, h) => (acc * 31L + h) % TextAnalysis.FpP)

  // --------------------------------------------------------------------- //

  test("langId matches the replace-trick Column form on every row") {
    val out = docs.select(col("doc_id"),
      TextAnalysis.langId(col("text")).as("nu"),
      langIdOld(col("text")).as("old")).collect()
    out.foreach(r => assert(r.getString(1) == r.getString(2),
      s"doc ${r.getLong(0)}: ${r.getString(1)} != ${r.getString(2)}"))
  }

  test("langScore matches the replace-trick count sum, per language") {
    TextAnalysis.LangMarkers.foreach { case (lang, ms) =>
      val out = docs.select(col("doc_id"),
        TextAnalysis.langScore(col("text"), ms).as("nu"),
        langScoreOld(col("text"), ms).as("old")).collect()
      out.foreach(r => assert(r.getLong(1) == r.getLong(2),
        s"$lang doc ${r.getLong(0)}: ${r.getLong(1)} != ${r.getLong(2)}"))
    }
  }

  test("stopword score used by qualityStats matches") {
    val ms = Seq(" the ", " a ", " of ", " and ", " is ")
    val out = docs.select(
      TextAnalysis.langScore(col("text"), ms).as("nu"),
      langScoreOld(col("text"), ms).as("old")).collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("fingerprint matches the HOF fold bit-for-bit") {
    val out = docs.select(col("doc_id"),
      TextAnalysis.fingerprint(col("text")).as("nu"),
      fingerprintOld(col("text")).as("old")).collect()
    out.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"doc ${r.getLong(0)}: ${r.getLong(1)} != ${r.getLong(2)}"))
  }

  test("shingle hashes match the HOF shingle builder on every row") {
    // the HOF form ShingleHashes replaced: distinct shingle STRINGS,
    // hashed after dedup — order and multiset must agree exactly
    def shinglesOld(text: Column, n: Int): Column =
      transform(Dedup.wordShingles(text, n), s => Dedup.hash60(s))
    val tricky = docs.union(Seq(
      (13L, "a b"),                   // fewer words than n
      (14L, "x y z x y z x y z"),     // repeated shingles (dedup path)
      (15L, "  leading and  double"), // empty words from space runs
      (16L, "tail space "),
      (17L, "一 二 三 四 五"))
      .toDF("doc_id", "text"))
    for (n <- Seq(2, 3)) {
      val out = tricky.select(col("doc_id"),
        graft.functions.ShingleHashesFn(col("text"), n).as("nu"),
        shinglesOld(col("text"), n).as("old")).collect()
      out.foreach(r => assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"n=$n doc ${r.getLong(0)}: ${r.getSeq[Long](1)} != ${r.getSeq[Long](2)}"))
    }
    // null text → null array (nullIntolerant), like the split-based form's input
    val withNull = Seq((1L, Option.empty[String])).toDF("doc_id", "text")
    assert(withNull.select(graft.functions.ShingleHashesFn(col("text"), 3))
      .collect().head.isNullAt(0))
  }

  test("simhash matches the explode + conditional-sum aggregate form") {
    // the shuffle-based form SimHash replaced, reproduced
    def simhashOld(df: org.apache.spark.sql.DataFrame, bits: Int) = {
      val ex = df.select(col("doc_id"), explode(split(col("text"), " ")).as("__w"))
        .withColumn("__h", conv(substring(md5(col("__w")), 1, 8), 16, 10).cast("long"))
      val sums = (0 until bits).map { j =>
        sum(when(shiftright(col("__h"), j).bitwiseAND(lit(1L)) === 1L, 1)
          .otherwise(-1)).as(s"__s$j")
      }
      ex.groupBy(col("doc_id")).agg(sums.head, sums.tail: _*)
        .withColumn("old", (0 until bits).map(j =>
          when(col(s"__s$j") > 0, lit(1L << j)).otherwise(lit(0L)): Column)
          .reduce(_ + _))
        .select(col("doc_id"), col("old"))
    }
    for (bits <- Seq(16, 32)) {
      val nu = graft.ops.Dedup.simHashSignatures(docs, "doc_id", col("text"), bits)
      val both = nu.join(simhashOld(docs, bits), "doc_id").collect()
      assert(both.length == docs.count())
      both.foreach(r => assert(r.getLong(1) == r.getLong(2),
        s"bits=$bits doc ${r.getLong(0)}: ${r.getLong(1)} != ${r.getLong(2)}"))
    }
  }

  test("null text yields null in all three expressions") {
    val d = Seq((1L, Option("x y z")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val out = d.select(col("doc_id"),
      TextAnalysis.fingerprint(col("text")).as("fp"),
      TextAnalysis.langId(col("text")).as("lid"),
      TextAnalysis.langScore(col("text"), Seq(" x ")).as("sc"))
      .collect().map(r => r.getLong(0) ->
        (r.isNullAt(1), r.isNullAt(2), r.isNullAt(3))).toMap
    assert(out(1L) == (false, false, false))
    assert(out(2L) == (true, true, true))
  }

  test("fuzz: codegen text expressions match HOF twins on random unicode") {
    import org.scalacheck.{Gen, rng}
    // words over ASCII, accented, CJK, and emoji (multi-byte UTF-8), plus
    // empty words via explicit space runs — md5 runs over raw byte spans,
    // so multi-byte boundaries are exactly where a slicing bug would hide
    val word = Gen.oneOf(
      Gen.stringOfN(3, Gen.alphaNumChar),
      Gen.oneOf("é", "ß", "ñé", "测试", "日本語", "🙂", "a🙂b", ""),
      Gen.oneOf("ж", "жж", "א", "بب"))
    val text = Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" ")))
    def sample(seed: Long): String =
      text.apply(Gen.Parameters.default, rng.Seed(seed)).getOrElse("")
    import spark.implicits._
    val docs = (1L to 200L).map(i => (i, sample(i))).toDF("doc_id", "text")
    def shinglesOld(t: Column, n: Int): Column =
      transform(Dedup.wordShingles(t, n), s => Dedup.hash60(s))
    val out = docs.select(col("doc_id"),
      TextAnalysis.fingerprint(col("text")).as("fpN"),
      fingerprintOld(col("text")).as("fpO"),
      graft.functions.ShingleHashesFn(col("text"), 3).as("shN"),
      shinglesOld(col("text"), 3).as("shO"),
      graft.functions.SimHashFn(col("text"), 32).as("smN")).collect()
    // simhash old form needs the explode+agg; join it back
    val old = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("__w"))
      .withColumn("__h", conv(substring(md5(col("__w")), 1, 8), 16, 10).cast("long"))
      .groupBy("doc_id")
      .agg((0 until 32).map(j =>
        sum(when(shiftright(col("__h"), j).bitwiseAND(lit(1L)) === 1L, 1)
          .otherwise(-1)).as(s"s$j")).head,
        (0 until 32).map(j =>
          sum(when(shiftright(col("__h"), j).bitwiseAND(lit(1L)) === 1L, 1)
            .otherwise(-1)).as(s"s$j")).tail: _*)
      .select(col("doc_id"), (0 until 32).map(j =>
        when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L)): Column)
        .reduce(_ + _).as("smO"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == r.getLong(2), s"fingerprint mismatch doc $id")
      assert(r.getSeq[Long](3) == r.getSeq[Long](4), s"shingles mismatch doc $id")
      assert(r.getLong(5) == old(id), s"simhash mismatch doc $id")
    }
  }

  test("expressions survive the interpreted (non-codegen) path too") {
    val noCodegen = docs.repartition(1)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val out = noCodegen.select(col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("nu"),
        fingerprintOld(col("text")).as("old"),
        TextAnalysis.langId(col("text")).as("lid"),
        langIdOld(col("text")).as("lidOld")).collect()
      out.foreach { r =>
        assert(r.getLong(1) == r.getLong(2))
        assert(r.getString(3) == r.getString(4))
      }
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("empty marker counts zero instead of looping forever") {
    import org.apache.spark.unsafe.types.UTF8String
    assert(graft.functions.MarkerOps.countIn(
      UTF8String.fromString("any text"), UTF8String.fromString("")) == 0L)
    // reachable through the public API: langScore with an empty marker
    val out = docs.select(
      TextAnalysis.langScore(col("text"), Seq("the", "")).as("s"),
      TextAnalysis.langScore(col("text"), Seq("the")).as("ref"))
      .collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("minhash_sig skips null slots in a nullable array<bigint>") {
    // self-sufficient SQL registration (don't depend on another suite
    // having installed GraftExtensions into the shared session first)
    val reg = spark.sessionState.functionRegistry
    new GraftExtensions().functions.foreach { case (id, info, builder) =>
      if (!reg.functionExists(id)) reg.registerFunction(id, info, builder)
    }
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val withNull = new GenericArrayData(Array[Any](7L, null, 11L))
    val dense = new GenericArrayData(Array[Any](7L, 11L))
    assert(graft.functions.MinHashSigUtil.sig(withNull, 4).toLongArray().toSeq ==
      graft.functions.MinHashSigUtil.sig(dense, 4).toLongArray().toSeq)
    // and through the SQL-registered function (nullable array literal)
    val viaSql = spark.sql(
      "SELECT minhash_sig(array(7L, CAST(NULL AS BIGINT), 11L), 4) AS s," +
        " minhash_sig(array(7L, 11L), 4) AS d").head()
    assert(viaSql.getSeq[Long](0) == viaSql.getSeq[Long](1))
  }

  test("token_entropy: counts, types, and micro-nat entropy match a by-hand model") {
    def facts(s: String): (Long, Long, Long) = {
      val a = graft.functions.TokenEntropyUtil.facts(
        org.apache.spark.unsafe.types.UTF8String.fromString(s)).toLongArray()
      (a(0), a(1), a(2))
    }
    // "a a b": n=3, types=2, terms round(-(2/3)ln(2/3)e6) + round(-(1/3)ln(1/3)e6)
    val t1 = Math.round(-(2.0 / 3) * Math.log(2.0 / 3) * 1e6)
    val t2 = Math.round(-(1.0 / 3) * Math.log(1.0 / 3) * 1e6)
    assert(facts("a a b") == ((3L, 2L, t1 + t2)))
    // uniform: "x y z w" → H = ln 4; four terms round(0.25·ln4·1e6)
    assert(facts("x y z w") ==
      ((4L, 4L, 4 * Math.round(0.25 * Math.log(4.0) * 1e6))))
    // single type: p=1 → exactly 0 micro-nats
    assert(facts("the the the") == ((3L, 1L, 0L)))
    assert(facts("word") == ((1L, 1L, 0L)))
  }

  test("token_entropy: string_split semantics — empties are tokens, '' is one empty token") {
    def facts(s: String): Seq[Long] = graft.functions.TokenEntropyUtil.facts(
      org.apache.spark.unsafe.types.UTF8String.fromString(s)).toLongArray().toSeq
    assert(facts("") == Seq(1L, 1L, 0L), "'' splits to one empty token")
    // "a  b " → ["a", "", "b", ""] : n=4, types 3 ("" counted once as a type)
    assert(facts("a  b ").take(2) == Seq(4L, 3L))
    // "   " → 4 empty tokens of one type → entropy 0
    assert(facts("   ") == Seq(4L, 1L, 0L))
    // non-ASCII round-trips through the split
    assert(facts("的 是 的").take(2) == Seq(3L, 2L))
  }

  test("tokenEntropy operator output matches the expression and is a no-shuffle plan") {
    val out = TextAnalysis.tokenEntropy(
      docs.filter(col("text").isNotNull), "doc_id", col("text"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected no shuffle, got:\n$plan")
    val r = out.filter(col("doc_id") === 9L).head() // "the the the the"
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)) ==
      ((4L, 1L, 0L, 0.0)))
  }

  test("normalizeText: Cc/Cf strip, NFC compose, space collapse, trim") {
    import graft.ops.TextAnalysis
    val rows = Seq(
      (1L, "plain ascii text"),
      (2L, "e\u0301cole"),              // e + combining acute -> \u00e9cole
      (3L, "zero\u200bwidth\u00a0?"),  // Cf stripped; NBSP is Zs: KEPT
      (4L, "ctl\u0007chars\ttabbed"),  // BEL and TAB are Cc: stripped
      (5L, "  a   b  "),                 // collapse + trim
      (6L, "\u00e9cole"))               // already NFC: unchanged
      .toDF("id", "t")
    val got = rows.select(col("id"),
        TextAnalysis.normalizeText(col("t")).as("n"),
        (TextAnalysis.normalizeText(col("t")) =!= col("t")).as("ch"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(2)))).toMap
    assert(got(1L) === (("plain ascii text", false)))
    assert(got(2L) === (("\u00e9cole", true)))
    assert(got(3L) === (("zerowidth\u00a0?", true)))
    assert(got(4L) === (("ctlcharstabbed", true)))
    assert(got(5L) === (("a b", true)))
    assert(got(6L) === (("\u00e9cole", false)))
    // null passes through
    val nl = Seq((1L, null: String)).toDF("id", "t")
      .select(TextAnalysis.normalizeText(col("t"))).collect()
    assert(nl.head.isNullAt(0))
  }
}
