package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only FIT-FRACTION frontier (r19 verdict task 5): the registered
  * `SampleFitFraction` = 0.5 was chosen from ONE comparison (0.25
  * starved recall, 0.5 ≈ full fit); this instrument makes the constant
  * a knee on a measured curve. Two tables, one JSON line per row:
  *
  *  1. RECALL at the bench fixture (SPARK_GRAFT_SF_DIR): the exact
  *     registered discipline — derived cells (⌈n/TargetCellOcc⌉),
  *     full-corpus prefix seeds, 2 Lloyd rounds on the hash-sample
  *     fraction — swept over fraction ∈ {0.25, 0.5, 0.75, 1.0},
  *     recall@10 vs brute truth at the registered operating point
  *     (nProbe = 4), with the fit's own wall time isolated.
  *  2. FIT COST at probe scale (SPARK_GRAFT_PROBE_SCALE, e.g. 10/30):
  *     the same fit over the ScaleProbe synthetic corpus — the pass
  *     whose cost the fraction divides (rounds × fraction × corpus ×
  *     cells cosines). With q174's persisted artifact the fit runs
  *     once per corpus, so a costlier fraction amortizes; the table
  *     prices exactly that trade. */
object FitFrontier {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fracs = Seq(0.25, 0.5, 0.75, 1.0)

    // --- recall rows at the bench fixture -------------------------- //
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()
    val n = emb.filter(col("embedding").isNotNull).count()
    val kc = math.max(2,
      math.ceil(n / SparkEntry.TargetCellOcc.toDouble).toInt)
    val all = emb.select(col("vec_id"), col("embedding"))
    val seeds = all.orderBy(col("vec_id")).limit(kc)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Float](1).toArray))
      .toSeq.sortBy(_._1)
    val queries = emb.filter(col("vec_id") < 25)
    val qn = queries.count().toDouble
    val truth = graft.ops.Similarity.bruteForceTopK(emb, "vec_id",
        "embedding", queries, "vec_id", "embedding", k = 10)
      .select(col("qid"), col("id")).cache()
    truth.count()
    for (frac <- fracs) {
      val t0 = System.nanoTime()
      val cents = graft.ops.Similarity.kmeansFitInt8(all, "embedding",
        seeds, iters = 2, fitFraction = frac, fitIdCol = "vec_id",
        fitSeed = "ivf")
      val fitWall = (System.nanoTime() - t0) / 1e9
      val approx = graft.ops.Similarity.ivfTopK(emb, "vec_id",
        "embedding", queries, "vec_id", "embedding", cents, k = 10,
        nProbe = 4)
      val hit = truth.join(approx.select(col("qid"), col("id")),
        Seq("qid", "id")).count()
      println(f"""{"frontier":"recall","fraction":$frac,""" +
        f""""recall_bp":${hit * 10000.0 / (qn * 10)}%.0f,""" +
        f""""cells":$kc,"fit_wall_s":$fitWall%.2f,"corpus":$n}""")
    }

    // --- fit-cost rows at probe scale ------------------------------ //
    val scale = sys.env.getOrElse("SPARK_GRAFT_PROBE_SCALE", "10").toInt
    val dir = sys.env.getOrElse("SPARK_GRAFT_PROBE_DIR",
      "/tmp/graft_scale_probe")
    for (s <- Seq(1, scale)) {
      val (_, embs, _) = ScaleProbe.corpus(spark, dir, s)
      val ns = embs.filter(col("embedding").isNotNull).count()
      val kcs = math.max(2,
        math.ceil(ns / SparkEntry.TargetCellOcc.toDouble).toInt)
      val alls = embs.select(col("vec_id"), col("embedding"))
      val seedsS = alls.orderBy(col("vec_id")).limit(kcs)
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => (r.getLong(0).toInt, r.getSeq[Float](1).toArray))
        .toSeq.sortBy(_._1)
      for (frac <- fracs) {
        // min of 2 reps — the fit is the measured unit, corpus cached
        // by the parquet read-back
        val wall = (0 until 2).map { _ =>
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          graft.ops.Similarity.kmeansFitInt8(alls, "embedding", seedsS,
            iters = 2, fitFraction = frac, fitIdCol = "vec_id",
            fitSeed = "ivf")
          (System.nanoTime() - t0) / 1e9
        }.min
        println(f"""{"frontier":"fit_cost","scale":$s,"fraction":$frac,""" +
          f""""cells":$kcs,"fit_wall_s":$wall%.2f,"corpus":$ns}""")
      }
    }
    spark.stop()
  }
}
