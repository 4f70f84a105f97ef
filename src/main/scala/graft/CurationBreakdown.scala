package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-time attribution for q91_curation_e2e — the single most
  * expensive registered query (r14 anchor 5.51 s at sf0.1). The five
  * stages compose lazily into ONE plan, so per-stage wall time can't be
  * read off the query itself; this instrument times each CUMULATIVE
  * prefix (gate, +exact dedup, +near-dup drop, +cap, +split) through
  * the same noop sink Bench uses and reports the successive deltas —
  * which stage a future q91 regression lives in. Not part of the
  * driver contract; the measured table lives in SCALING.md (round 14).
  * Env knobs: `SPARK_GRAFT_SF_DIR` (default sf0.1), `CB_REPS` (3). */
object CurationBreakdown {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("CB_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.{Dedup, Sampling}

    // exactly q91's stages and parameters (SparkEntry.qCurationE2E)
    def docs = SparkEntry.cpuTable(spark, sfDir, "documents")
    def gated = docs.filter(col("n_chars") >= 100L && col("n_chars") <= 5000L)
    def d1 = Dedup.dropNormalizedDups(gated, "doc_id", col("text"))
    def pairs = Dedup.ngramJaccardPairs(d1, "doc_id", col("text"),
      n = 3, threshold = 0.5, maxDf = 100)
    def d2 = Dedup.dropNearDups(d1, "doc_id", pairs)
    def capped = Sampling.capPerGroup(d2, "source", "doc_id",
      n = 40, seed = "cur1")
    def full = Sampling.hashSplit(capped, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = "cur1")
      .filter(col("split") === "train")
      .select(col("doc_id"), col("lang"), col("source"))

    val prefixes: Seq[(String, () => DataFrame)] = Seq(
      "gate" -> (() => gated),
      "exact_dedup" -> (() => d1),
      "neardup_drop" -> (() => d2),
      "cap_per_source" -> (() => capped),
      "hash_split" -> (() => full))

    val mins = prefixes.map { case (label, mk) =>
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        spark.sharedState.cacheManager.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[q91] prefix-through-$label%-15s min=${ts.min}%.2f " +
        f"reps=${ts.map(t => f"$t%.2f").mkString(",")}")
      label -> ts.min
    }
    mins.zip(0.0 +: mins.map(_._2)).foreach { case ((label, cum), prev) =>
      println(f"[q91] stage $label%-15s delta=${cum - prev}%+.2f s (cumulative $cum%.2f)")
    }
    spark.stop()
  }
}
