package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Shared session + record builders for specs. Mirrors the reference's
  * test-input shape: a list of (key, value, timestamp-millis) per topic
  * (willa `test_utils.clj:46-51`). */
object TestKit {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Record-shaped DF from (key, intValue, tsMillis) triples. */
  def records(rows: (String, Int, Long)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("key", "value", "__ms")
      .withColumn("ts", timestamp_millis(col("__ms"))).drop("__ms")
  }

  /** Collect a record DF to (key, value) pairs sorted for comparison —
    * the reference compares leaf outputs on :key/:value
    * (`test_utils.clj:86-92`). */
  def kvInt(df: DataFrame): Seq[(String, Int)] =
    df.select("key", "value").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) Int.MinValue
        else r.get(1).asInstanceOf[Number].intValue()))
      .toSeq.sorted

  def kvRows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq

  /** Reconstruct a session fold's FINAL windows from its eager changelog
    * rows (in emission order): per (key, window_start), updates carry
    * non-decreasing window_end and a tombstone (null value) shares the
    * window_end of the last update it retracts — so the
    * max-(we, null-last, emission-order) row is the session's fate:
    * null = merged away, else the final acc. The emission-order tiebreak
    * resolves same-(ws, we) re-emissions after interior out-of-order
    * arrivals. ONE home for this tombstone tiebreak — the congruity and
    * recovery suites must canonicalize identically or a semantics change
    * shows up as a phantom engine bug in whichever suite lags. */
  def sessionFinalsOf(rows: Seq[Row]): Seq[(String, Int, Long, Long)] =
    rows.zipWithIndex
      .groupBy { case (r, _) =>
        (r.getAs[String]("key"),
          r.getAs[java.sql.Timestamp]("window_start").getTime)
      }.toSeq
      .flatMap { case ((k, ws), es) =>
        val (last, _) = es.maxBy { case (r, i) =>
          (r.getAs[java.sql.Timestamp]("window_end").getTime,
            if (r.isNullAt(r.fieldIndex("value"))) 1 else 0, i)
        }
        if (last.isNullAt(last.fieldIndex("value"))) None
        else Some((k, last.getAs[Number]("value").intValue(), ws,
          last.getAs[java.sql.Timestamp]("window_end").getTime))
      }.sorted

  /** Batch twin of [[sessionFinalsOf]]: a batch session fold's rows are
    * already final. */
  def sessionBatchOf(df: DataFrame): Seq[(String, Int, Long, Long)] =
    df.select(col("key"), col("value").cast("int"), col("window_start"),
      col("window_end")).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getTimestamp(2).getTime,
        r.getTimestamp(3).getTime)).toSeq.sorted

  /** Arrival-order reference model of the LIVE stream–table join's
    * documented contract: lookup-at-arrival against the latest-event-time
    * table value seen so far, (ts, table-first) order within each
    * micro-batch. `Left` = table update, `Right` = stream record; one
    * inner Seq per micro-batch. ONE home for the model — congruity and
    * recovery property suites must agree on the contract they test. */
  def streamTableArrivalModel(
      bs: Seq[Seq[Either[(String, Int, Long), (String, Int, Long)]]])
      : Seq[(String, Int, Any, Long)] = {
    val tbl = scala.collection.mutable.Map.empty[String, (Int, Long)]
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Any, Long)]
    bs.foreach { b =>
      b.sortBy { case Left((_, _, t)) => (t, 0); case Right((_, _, t)) => (t, 1) }
        .foreach {
          case Left((k, v, t)) =>
            if (tbl.get(k).forall(_._2 <= t)) tbl(k) = (v, t)
          case Right((k, v, t)) =>
            out += ((k, v, tbl.get(k).map(_._1).orNull, t))
        }
    }
    out.toSeq.sortBy(_.toString)
  }
}
