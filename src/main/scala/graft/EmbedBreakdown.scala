package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-time attribution for q118_embedding_e2e (the CurationBreakdown
  * pattern): the three stages compose lazily into ONE plan, so this
  * times each CUMULATIVE prefix (semantic dedup, +mask/cache,
  * +label propagation, +final agg) through the same noop-count sink and
  * reports successive deltas — which stage a q118 move lives in. Not
  * part of the driver contract; the measured table lives in SCALING.md.
  * Env knobs: `SPARK_GRAFT_SF_DIR` (default sf0.1), `EB_REPS` (3). */
object EmbedBreakdown {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("EB_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.{CacheScope, Dedup, Similarity}

    // exactly q118's stages and parameters (SparkEntry.qEmbeddingE2E)
    def embs = SparkEntry.cpuTable(spark, sfDir, "embeddings")
    def surv(sc: CacheScope) = Dedup.semanticDedup(embs, "vec_id",
        col("embedding"), signBits = 8, threshold = 0.35,
        maxBucket = 1000L, probes = 3, scope = sc)
      .select(col("vec_id"))
    def masked(sc: CacheScope) = sc.cache(
      embs.join(surv(sc), Seq("vec_id"), "left_semi")
        .withColumn("lbl", when(col("vec_id") % 3 === 0, col("label"))))
    def predicted(sc: CacheScope) = Similarity.labelPropagate(masked(sc),
      "vec_id", "embedding", "lbl", k = 5, signBits = 8, probeHamming = 1,
      maxBucketOccupancy = 1000L, scope = sc)
    def full(sc: CacheScope) = {
      val m = masked(sc)
      m.filter(col("lbl").isNotNull).select(col("vec_id"), col("lbl"))
        .unionByName(Similarity.labelPropagate(m, "vec_id", "embedding",
          "lbl", k = 5, signBits = 8, probeHamming = 1,
          maxBucketOccupancy = 1000L, scope = sc).select(col("vec_id"), col("lbl")))
        .groupBy(col("lbl").as("label"))
        .agg(count(lit(1)).as("n_members"), sum(col("vec_id")).as("sum_ids"))
    }

    val prefixes: Seq[(String, CacheScope => DataFrame)] = Seq(
      "semantic_dedup" -> (sc => surv(sc)),
      "mask_cache" -> (sc => masked(sc)),
      "label_prop" -> (sc => predicted(sc)),
      "full_q118" -> (sc => full(sc)))

    val mins = prefixes.map { case (label, mk) =>
      val t = (0 until reps).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        CacheScope.using(sc => mk(sc).count())
        (System.nanoTime() - t0) / 1e9
      }.min
      label -> t
    }
    def d2(x: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(x))
    val deltas = mins.zip(("start", 0.0) +: mins.init).map {
      case ((l, t), (_, prev)) => s""""$l":{"cum":${d2(t)},"delta":${d2(t - prev)}}"""
    }
    println(s"""{"metric":"embed_breakdown","unit":"sec","reps":$reps,""" +
      s""""stages":${deltas.mkString("{", ",", "}")}}""")
    spark.stop()
  }
}
