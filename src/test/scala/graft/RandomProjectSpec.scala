package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Similarity

/** [[graft.ops.Similarity.randomProjectInt8]]: exact agreement with a
  * driver-side reference (quantize → ±1 matrix → integer sums), null
  * pass-through, and the JL property sanity (projected cosines track
  * original cosines on average). */
class RandomProjectSpec extends AnyFunSuite {

  import TestKit._
  import spark.implicits._

  private val Dim = 24
  private val Out = 12

  private def refProject(v: Array[Float], seed: String): Array[Long] = {
    val s = v.map(x => math.abs(x.toDouble)).max
    val q = if (s == 0) Array.fill(Dim)(0L)
      else v.map(x => BigDecimal(x.toDouble * 127.0 / s)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    (0 until Out).map(j =>
      (0 until Dim).map(i => q(i) * Similarity.jlSign(seed, i, j)).sum).toArray
  }

  test("randomProjectInt8 == driver-side reference; nulls pass through; zero vector projects to zeros") {
    val rnd = new scala.util.Random(13)
    val vecs: Seq[(Long, Array[Float])] = (1L to 50L).map(id =>
      id -> Array.fill(Dim)((rnd.nextDouble() * 2 - 1).toFloat)) :+
      (98L -> Array.fill(Dim)(0.0f)) :+ (99L -> null)
    val got = Similarity.randomProjectInt8(
      vecs.toDF("vec_id", "embedding"), "embedding", Dim, Out, "t1")
      .select(col("vec_id"), col("proj")).collect()
      .map(r => r.getLong(0) ->
        Option(r.get(1)).map(_.asInstanceOf[scala.collection.Seq[Long]].toArray)).toMap
    assert(got(99L).isEmpty)
    assert(got(98L).get.toSeq == Seq.fill(Out)(0L))
    vecs.filter(v => v._2 != null && v._1 != 98L).foreach { case (id, v) =>
      assert(got(id).get.toSeq == refProject(v, "t1").toSeq, s"vec $id")
    }
  }

  test("JL sanity: projected cosines track quantized-original cosines on average") {
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      if (na == 0 || nb == 0) 0.0 else d / (na / 1 * nb)
    }
    val rnd = new scala.util.Random(29)
    val vecs = (0 until 30).map(_ => Array.fill(Dim)(rnd.nextDouble() * 2 - 1))
    val projs = vecs.map(v => refProject(v.map(_.toFloat), "t2").map(_.toDouble))
    val errs = for (a <- vecs.indices; b <- 0 until a) yield
      math.abs(cos(vecs(a), vecs(b)) - cos(projs(a), projs(b)))
    val mean = errs.sum / errs.size
    assert(mean < 0.25, f"mean |cos error| $mean%.3f too large for ${Out} dims")
  }
}
