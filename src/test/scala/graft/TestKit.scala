package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
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
}
