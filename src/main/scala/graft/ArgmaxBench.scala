package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B instrument for the argmax implementations: native
  * `max_by(struct, struct)` (plans SortAggregate) vs
  * [[graft.functions.ArgExtremum]] (plans ObjectHashAggregate) on a
  * synthetic latest-per-key. Env knobs: `AB_ROWS` (default 20M),
  * `AB_KEYS` (200k), `AB_FALLBACK`
  * (`spark.sql.objectHashAggregate.sortBased.fallbackThreshold`,
  * default 128 = Spark's default). Not part of the driver contract;
  * the measured regime table lives in SCALING.md (round 13): the hash
  * path wins at bounded per-partition group cardinality, degrades
  * gracefully to the internal sort fallback past the threshold, and
  * raising the threshold to millions OOMs — the threshold is the
  * object map's only memory guard, so leave it alone. */
object ArgmaxBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("AB_FALLBACK", "128"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val n = sys.env.getOrElse("AB_ROWS", "20000000").toLong
    val keys = sys.env.getOrElse("AB_KEYS", "200000").toLong
    val df = spark.range(n).select(
      (col("id") % keys).as("k"),
      (col("id") * 2654435761L % 1000000007L).as("ts"),
      concat(lit("payload_"), col("id")).as("v"))
      .persist()
    df.count()
    val ord = struct(col("ts"), col("v"))
    val payload = struct(col("ts"), col("v"))
    def time(label: String)(body: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"[ab] $label%-12s min=${ts.min}%.2f reps=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    time("native") {
      df.groupBy("k").agg(max_by(payload, ord).as("p"))
        .write.format("noop").mode("overwrite").save()
    }
    time("argextremum") {
      df.groupBy("k").agg(graft.functions.ArgExtremum.maxBy(payload, ord).as("p"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
