package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic (r19): isolate WHY the registered sampled fit
  * reads ~58% recall@10 where the full-corpus fit reads ~91% at the
  * same 32 cells / same scan. Four fits, one harness, one session. */
object OccDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()
    val queries = emb.filter(col("vec_id") < 25)
    val qn = queries.count().toDouble
    val truth = graft.ops.Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 10).select(col("qid"), col("id"))
    val all = emb.select(col("vec_id"), col("embedding"))
    val sample = graft.ops.Sampling.hashSample(all, "vec_id", 0.25, "ivf")
    def lowSeeds(df: org.apache.spark.sql.DataFrame, k: Int) =
      df.orderBy(col("vec_id")).limit(k)
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => (r.getLong(0).toInt, r.getSeq[Float](1).toArray))
        .toSeq.sortBy(_._1)
    val fits = Seq(
      // the registered default verbatim
      ("sampled_seed_sampled_fit_i2", lowSeeds(sample, 32), Some(0.25), 2),
      // seed rule isolated: sampled seeds, FULL fit
      ("sampled_seed_full_fit_i2", lowSeeds(sample, 32), None, 2),
      // fit data isolated: full seeds, SAMPLE fit
      ("full_seed_sampled_fit_i2", lowSeeds(all, 32), Some(0.25), 2),
      // the r17 pin (should reproduce ~9080)
      ("full_seed_full_fit_i2", lowSeeds(all, 32), None, 2),
      // does depth rescue the sampled fit?
      ("sampled_seed_sampled_fit_i4", lowSeeds(sample, 32), Some(0.25), 4),
      ("sampled_seed_sampled_fit_i8", lowSeeds(sample, 32), Some(0.25), 8),
      // a denser sample?
      ("sampled50_seed_sampled50_fit_i2",
        lowSeeds(graft.ops.Sampling.hashSample(all, "vec_id", 0.5, "ivf"), 32),
        Some(0.5), 2)) ++ {
      // hash-ordered seeds: a deterministic pseudorandom 32-of-corpus
      // draw (ORDER BY hash60('seed'||id) LIMIT k — oracle-expressible
      // like the sample predicate), vs the id-prefix rule
      def hashSeeds(df: org.apache.spark.sql.DataFrame, k: Int, salt: String) =
        df.orderBy(graft.ops.Dedup.hash60(
            concat(lit(salt), col("vec_id").cast("string"))), col("vec_id"))
          .limit(k)
          .select(col("vec_id"), col("embedding")).collect()
          .map(r => (r.getLong(0).toInt, r.getSeq[Float](1).toArray))
          .toSeq.sortBy(_._1)
      Seq(
        ("hash_seed_sampled_fit_i2", hashSeeds(all, 32, "sd"), Some(0.25), 2),
        ("hash_seed_full_fit_i2", hashSeeds(all, 32, "sd"), None, 2),
        ("hash_seed_sampled50_fit_i2", hashSeeds(all, 32, "sd"), Some(0.5), 2),
        ("hashsample_seed_sampled_fit_i2",
          hashSeeds(sample, 32, "sd"), Some(0.25), 2),
        ("full_seed_sampled50_fit_i2", lowSeeds(all, 32), Some(0.5), 2))
    } ++ {
      // the occupancy sweep under the CANDIDATE rule (full-corpus
      // prefix seeds + 50% sample fit) at fixed scan budget 256
      for ((occ, np) <- Seq((32, 8), (64, 4), (128, 2))) yield {
        val cells = math.max(2, math.ceil(2000.0 / occ).toInt)
        (s"cand_occ${occ}_np$np" + "_probe" + np,
          lowSeeds(all, cells), Some(0.5), 2)
      }
    }
    val withNp = fits.map { case t @ (label, _, _, _) =>
      val np = if (label.contains("_probe")) label.split("_probe").last.toInt else 4
      (t._1, t._2, t._3, t._4, np)
    }
    for ((label, seeds, frac, iters, nProbe) <- withNp) {
      val cents = frac match {
        case Some(f) => graft.ops.Similarity.kmeansFitInt8(all, "embedding",
          seeds, iters = iters, fitFraction = f, fitIdCol = "vec_id",
          fitSeed = "ivf")
        case None => graft.ops.Similarity.kmeansFitInt8(all, "embedding",
          seeds, iters = iters)
      }
      val approx = graft.ops.Similarity.ivfTopK(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", cents, k = 10, nProbe = nProbe)
      val hit = truth.join(approx.select(col("qid"), col("id")),
        Seq("qid", "id")).count()
      val assign = emb.select(graft.functions.NearestCentroidFn(
          col("embedding"), cents).as("c"))
        .groupBy("c").count().collect()
        .map(x => x.getInt(0) -> x.getLong(1)).toMap
      val qcells = queries.select(explode(graft.ops.Similarity.ivfProbes(
          col("embedding"), cents, nProbe)).as("c")).collect().map(_.getInt(0))
      val scanned = qcells.map(c => assign.getOrElse(c, 0L)).sum / qn
      println(f"""{"fit":"$label","recall_bp":${hit * 10000.0 / (qn * 10)}%.0f,""" +
        f""""cells_occupied":${assign.size},"scanned_per_query":$scanned%.0f}""")
    }
    spark.stop()
  }
}
