package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Similarity

/** [[graft.ops.Similarity.ivfDrift]]: hand-computed per-cell facts on a
  * fixture engineered to exercise every trigger — a healthy cell, a
  * cohesion-breach cell (batch lands between the fitted cells), a
  * growth-breach cell, and a cell with no new members. */
class IvfDriftSpec extends AnyFunSuite {

  import TestKit._
  import spark.implicits._

  // two axis-aligned centroids; cid 0 = x-axis, cid 1 = y-axis
  private val cents = Seq(
    0 -> Array(1f, 0f, 0f),
    1 -> Array(0f, 1f, 0f))

  private def df(rows: Seq[(Long, Array[Float])]) =
    rows.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")

  private def run(standing: Seq[(Long, Array[Float])],
      batch: Seq[(Long, Array[Float])], floorBp: Long = 3500L,
      capBp: Long = 5000L) =
    Similarity.ivfDrift(df(standing), df(batch), "embedding", cents,
      floorBp, capBp)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5)),
        r.getBoolean(6)))
      .toSeq.sortBy(_._1)

  test("healthy cell: aligned batch, growth under cap, no refit") {
    val standing = Seq(
      (1L, Array(1f, 0f, 0f)), (2L, Array(0.9f, 0.1f, 0f)),
      (3L, Array(0.95f, 0f, 0.05f)), (5L, Array(0f, 1f, 0f)))
    val batch = Seq((4L, Array(1f, 0f, 0f)))
    val got = run(standing, batch)
    // cell 0: 3 standing, 1 new -> growth 3333 bp, cohesion 10000
    assert(got(0) === ((0L, 3L, 1L, 3333L, Some(10000L), Some(10000L), false)))
    // cell 1: 1 standing, 0 new -> nulls, no refit
    assert(got(1) === ((1L, 1L, 0L, 0L, None, None, false)))
  }

  test("cohesion breach: batch lands between the fitted cells") {
    val standing = Seq((1L, Array(1f, 0f, 0f)), (2L, Array(0f, 1f, 0f)))
    // 45-degree vector: cos to either centroid = 0.707107 -> 7071 bp,
    // above a 3500 floor; a NEAR-ORTHOGONAL one breaches it
    val batch = Seq((4L, Array(0.2f, 0.1f, 0.97f)))
    val got = run(standing, batch, floorBp = 3500L, capBp = 500000L)
    val c0 = got(0)
    assert(c0._3 === 1L)
    assert(c0._5.get < 3500L)   // cohesion below floor
    assert(c0._7 === true)      // refit fires
  }

  test("growth breach fires independently of cohesion") {
    val standing = Seq((1L, Array(1f, 0f, 0f)), (2L, Array(0f, 1f, 0f)))
    val batch = Seq(
      (4L, Array(1f, 0f, 0f)), (8L, Array(0.99f, 0.01f, 0f)))
    // cell 0: 1 standing, 2 new -> growth 20000 bp > 5000 cap
    val got = run(standing, batch)
    assert(got(0)._4 === 20000L)
    assert(got(0)._7 === true)
    // perfect cohesion did not save it
    assert(got(0)._5.get > 9000L)
  }

  test("negative-cosine cohesion is exact (shifted integer division)") {
    val standing = Seq((1L, Array(1f, 0f, 0f)), (2L, Array(0f, 1f, 0f)))
    // batch member anti-aligned with BOTH centroids: assigned to the
    // less-bad one; cohesion must be the exact negative bp, not a
    // floor-vs-trunc casualty
    val batch = Seq((4L, Array(-1f, -0.5f, 0f)))
    val got = run(standing, batch, floorBp = -20000L, capBp = 500000L)
    val assigned = got.filter(_._3 > 0L).head
    val cos = {
      val (a, b) =
        if (assigned._1 == 0L) (Array(-1f, -0.5f, 0f), Array(1f, 0f, 0f))
        else (Array(-1f, -0.5f, 0f), Array(0f, 1f, 0f))
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val bp = BigDecimal(cos * 10000)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    assert(assigned._5 === Some(bp))
    assert(bp < 0L)
  }

  test("ivfDriftState: LIVE final == batch ivfDrift per arrived cell, " +
      "under SHUFFLED arrival (moments commute)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.stream.{Rec, Streamed}
    implicit val sql = spark.sqlContext
    val rnd = new scala.util.Random(1234)
    val cents4 = (0 until 4).map(i =>
      i -> Array.fill(4)(rnd.nextGaussian().toFloat)).toSeq
    val standing = (0L until 40L).map(id =>
      (id, Array.fill(4)(rnd.nextGaussian().toFloat)))
    val arriving = (100L until 130L).map(id =>
      (id, Array.fill(4)(rnd.nextGaussian().toFloat)))
    val floor = 3500L; val cap = 8000L
    val batchOut = Similarity.ivfDrift(df(standing), df(arriving),
        "embedding", cents4, floor, cap)
      .collect().filter(_.getLong(2) > 0) // cells with arrivals
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6))).toMap
    // the live producer reuses the batch op's own stateless projection
    val standingCounts = Similarity.assignBp(df(standing), "embedding", cents4)
      .groupBy("cell").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val feedRows = Similarity.assignBp(df(arriving), "embedding", cents4)
      .select("cell", "bp").collect().map(r => (r.getLong(0), r.getLong(1)))
    val feed = rnd.shuffle(feedRows.toSeq).zipWithIndex
      .map { case ((c, bp), i) => Rec(c, bp, i.toLong) }
    val ms = MemoryStream[Rec[Long, Long]]
    val q = Streamed.ivfDriftState(ms.toDS(), standingCounts, floor, cap)
      .writeStream.format("memory").queryName("liveivfdrift")
      .outputMode("update").start()
    try {
      ms.addData(feed.take(15): _*); q.processAllAvailable()
      ms.addData(feed.drop(15): _*); q.processAllAvailable()
    } finally q.stop()
    val live = spark.table("liveivfdrift").collect()
      .map(r => (r.getLong(0), r.getStruct(1))).groupBy(_._1)
      .map { case (c, rows) =>
        val last = rows.map(_._2).maxBy(_.getLong(1)) // final nNew
        c -> (last.getLong(0), last.getLong(1), last.getLong(2),
          last.getLong(3), last.getLong(4), last.getBoolean(5))
      }
    assert(live == batchOut)
  }

  test("ivfDriftState: cell moments survive restart (no reset, no replay)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.stream.{Rec, Streamed}
    import org.apache.spark.sql.Dataset
    implicit val sql = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("ivfdrift_ckpt").toString
    val ms = MemoryStream[Rec[Long, Long]]
    val out = Streamed.ivfDriftState(ms.toDS(),
      Map(0L -> 2L, 1L -> 1L), cohesionFloorBp = 3500L, growthCapBp = 50000L)
    def start(buf: scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]) =
      out.writeStream.outputMode("update")
        .option("checkpointLocation", dir)
        .foreachBatch { (b: Dataset[Rec[Long, Streamed.IvfDriftOut]], _: Long) =>
          val rows = b.collect()
          buf.synchronized {
            buf ++= rows.map(r =>
              (r.key, r.value.nNew, r.value.cohesionBp, r.value.minCosBp))
          }
          ()
        }.start()
    val buf1 = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    val q1 = start(buf1)
    try {
      ms.addData(Rec(0L, 9000L, 1L), Rec(0L, 8000L, 2L))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(buf1.synchronized(buf1.maxBy(_._2)) === ((0L, 2L, 8500L, 8000L)))

    val buf2 = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    val q2 = start(buf2)
    try {
      ms.addData(Rec(0L, 7000L, 3L)); q2.processAllAvailable()
    } finally q2.stop()
    // moments restored (count 3, mean over ALL three bps, min drops to
    // 7000), offsets restored (exactly one emission — no replay)
    assert(buf2.synchronized(buf2.toSeq) === Seq((0L, 3L, 8000L, 7000L)))
  }

  test("every centroid emits exactly one row") {
    val standing = Seq((1L, Array(1f, 0f, 0f)))
    val got = run(standing, Seq.empty[(Long, Array[Float])])
    assert(got.map(_._1) === Seq(0L, 1L))
    assert(got(1) === ((1L, 0L, 0L, 0L, None, None, false)))
  }
}
