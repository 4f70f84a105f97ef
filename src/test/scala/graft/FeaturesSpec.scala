package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Features

/** [[graft.ops.Features]]: out-of-fold target encoding against a
  * driver-side reference with the same md5 fold hash, the leakage
  * property itself (a row's own label never enters its fold's
  * encoding), and count encoding. */
class FeaturesSpec extends AnyFunSuite {

  import TestKit._
  import spark.implicits._

  private def md5Fold(seed: String, id: Long, folds: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest((seed + id).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16) % folds
  }

  test("targetEncode matches a driver-side reference; empty-oof is NULL") {
    val rnd = new scala.util.Random(5)
    val rows = (0L until 200L).map(id =>
      (id, "c" + rnd.nextInt(4), rnd.nextInt(50).toLong)) :+
      ((999L, "lonely", 7L)) // one-row category: its own fold has no oof
    val df = rows.toDF("id", "cat", "t")
    val got = Features.targetEncode(df, "cat", "t", "id", folds = 3, seed = "s")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) null else r.getDouble(4)))).toMap
    assert(got.size === 5 * 3, "complete category x fold grid")
    val byCat = rows.groupBy(_._2)
    for (((cat, fold), (nOof, sOof, enc)) <- got) {
      val inCat = byCat(cat)
      val oof = inCat.filterNot(r => md5Fold("s", r._1, 3) == fold)
      assert(nOof === oof.size.toLong, s"$cat/$fold n")
      assert(sOof === oof.map(_._3).sum, s"$cat/$fold sum")
      if (oof.isEmpty) assert(enc == null, s"$cat/$fold must be NULL")
      else assert(enc === new java.math.BigDecimal(
        oof.map(_._3).sum.toDouble / oof.size.toDouble)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue())
    }
    // the leakage property, stated directly: removing a row from the
    // corpus never changes OTHER folds' encodings for its category,
    // and its own fold's encoding never saw its label
    val lonelyFold = md5Fold("s", 999L, 3)
    assert(got(("lonely", lonelyFold))._3 == null)
    (0 until 3).filter(_ != lonelyFold).foreach { f =>
      assert(got(("lonely", f))._3 === 7.0)
    }
  }

  test("countEncode: exact counts and basis-point shares") {
    val df = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("cat")
    val got = Features.countEncode(df, "cat")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map("a" -> ((6L, 6000L)), "b" -> ((3L, 3000L)),
      "c" -> ((1L, 1000L))))
  }
}
