package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Similarity

/** [[graft.ops.Similarity.ivfRefitReport]]: hand-computed migration on
  * a fixture where the refit pulls one vector across cells, plus
  * conservation properties on seeded random corpora. */
class IvfRefitSpec extends AnyFunSuite {

  import TestKit._
  import spark.implicits._

  private def df(rows: Seq[(Long, Array[Float])]) =
    rows.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")

  private def run(rows: Seq[(Long, Array[Float])],
      oldC: Seq[(Int, Array[Float])], newC: Seq[(Int, Array[Float])]) =
    Similarity.ivfRefitReport(df(rows), "embedding", oldC, newC)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSeq.sortBy(_._1)

  test("one vector migrates: stay/in/out bookkeeping is exact") {
    val oldC = Seq(0 -> Array(1f, 0f), 1 -> Array(0f, 1f))
    // refit drags cell 0's centroid toward the diagonal
    val newC = Seq(0 -> Array(0.7f, 0.7f), 1 -> Array(0f, 1f))
    val rows = Seq(
      (10L, Array(1f, 0f)),    // old cell 0 -> new cell 0 (stays)
      (11L, Array(0.6f, 0.8f)) // old cell 1 -> new cell 0 (migrates)
    )
    val got = run(rows, oldC, newC)
    assert(got === Seq(
      (0L, 1L, 2L, 1L, 1L, 0L),
      (1L, 1L, 0L, 0L, 0L, 1L)))
  }

  test("identical quantizers: nothing moves") {
    val c = Seq(0 -> Array(1f, 0f), 1 -> Array(0f, 1f))
    val rows = Seq((1L, Array(1f, 0.1f)), (2L, Array(0.1f, 1f)),
      (3L, Array(0.9f, 0.2f)))
    val got = run(rows, c, c)
    got.foreach { r =>
      assert(r._2 === r._3) // before == after
      assert(r._3 === r._4) // all stayed
      assert(r._5 === 0L && r._6 === 0L)
    }
  }

  test("conservation on seeded random data: Σbefore == Σafter == n; Σin == Σout") {
    val rnd = new scala.util.Random(99)
    val rows = (0L until 60L).map(id =>
      (id, Array.fill(4)(rnd.nextGaussian().toFloat)))
    val oldC = (0 until 5).map(i =>
      i -> Array.fill(4)(rnd.nextGaussian().toFloat)).toSeq
    val newC = oldC.map { case (cid, v) =>
      cid -> v.zipWithIndex.map { case (x, j) =>
        x + 0.3f * rnd.nextGaussian().toFloat }
    }
    val got = run(rows, oldC, newC)
    assert(got.map(_._2).sum === 60L)
    assert(got.map(_._3).sum === 60L)
    assert(got.map(_._5).sum === got.map(_._6).sum)
    got.foreach { r =>
      assert(r._3 === r._4 + r._5) // after = stay + in
      assert(r._2 === r._4 + r._6) // before = stay + out
    }
  }

  test("mismatched centroid ids are rejected (warm-start contract)") {
    val oldC = Seq(0 -> Array(1f, 0f), 1 -> Array(0f, 1f))
    val newC = Seq(0 -> Array(1f, 0f), 2 -> Array(0f, 1f))
    assertThrows[IllegalArgumentException] {
      Similarity.ivfRefitReport(df(Seq((1L, Array(1f, 0f)))),
        "embedding", oldC, newC)
    }
  }
}
