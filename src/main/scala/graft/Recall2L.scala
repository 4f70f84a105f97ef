package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev-only recall measurement for the TWO-LEVEL descent AT THE REGIME
  * WHERE q173's AUTO ROUTE ACTUALLY FLIPS (r19 verdict task 1): the
  * router switches to the descent at `TwoLevelAtCells` = 4096 cells on
  * WALL-TIME evidence, but its recall was measured only at 32/128
  * cells — a regime SCALING.md itself says does not transfer (at 32
  * cells each branch carries ~4 fines; at 4096 cells a branch carries
  * ~45 and the hierarchy is real). This instrument builds the SAME
  * dense corpus shape `knn_join_auto_dense` probes (the ScaleProbe
  * synthetic generator, seeds-as-centroids — the boundary is a cell-
  * COUNT rule, so the dense fixture is where the flip is exercised),
  * computes brute-force truth on a query sample, and sweeps
  * `branchProbes` × `replicas` of [[graft.ops.Similarity
  * .twoLevelIndexFitted]] against the FLAT assignment at matched
  * nProbe — the recall the flip trades for its measured 4–6× e2e win.
  *
  * Knobs (env): SPARK_GRAFT_R2L_CORPUS (default 8192 — occupancy 2 at
  * 4096 cells, the dense-fixture shape), SPARK_GRAFT_R2L_CELLS
  * (default 4096 = the registered boundary), SPARK_GRAFT_R2L_QUERIES
  * (default 100), SPARK_GRAFT_R2L_OCC64=1 adds the deployment-
  * occupancy shape (corpus = cells × 64) — expensive: the flat
  * baseline pays corpus × cells cosines.
  *
  * One JSON line per row; SCALING.md records the table and the route
  * constants cite it. */
object Recall2L {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val nCorpus = sys.env.getOrElse("SPARK_GRAFT_R2L_CORPUS", "8192").toInt
    val cells = sys.env.getOrElse("SPARK_GRAFT_R2L_CELLS", "4096").toInt
    val nQ = sys.env.getOrElse("SPARK_GRAFT_R2L_QUERIES", "100").toInt
    def intList(env: String, dflt: Seq[Int]): Seq[Int] =
      sys.env.get(env).map(_.split(",").map(_.trim.toInt).toSeq)
        .getOrElse(dflt)
    val bpGrid = intList("SPARK_GRAFT_R2L_BP", Seq(2, 3, 4, 6))
    val rGrid = intList("SPARK_GRAFT_R2L_REPLICAS", Seq(1, 2, 3))
    val npGrid = intList("SPARK_GRAFT_R2L_NPROBE", Seq(4, 8, 16))
    val k = 10
    val path = s"/tmp/graft_recall2l/c${nCorpus}"
    spark.range(nCorpus.toLong).map(id => ScaleProbe.vecOf(id))
      .write.mode("overwrite").parquet(path)
    val emb = spark.read.parquet(path).cache()
    emb.count()
    val queries = emb.filter(col("vec_id") < nQ)
    val qn = nQ.toDouble
    // dense convention (knn_join_auto_dense): seeds ARE the centroids —
    // the boundary rule is a cell-count property, not a fit property
    val cents = emb.filter(col("vec_id") < cells)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Float](1).toArray))
      .toSeq.sortBy(_._1)
    require(cents.size == cells, s"corpus smaller than $cells")
    val truth = graft.ops.Similarity.bruteForceTopK(emb, "vec_id",
        "embedding", queries, "vec_id", "embedding", k = k)
      .select(col("qid"), col("id")).cache()
    truth.count()

    // FLAT baseline at this geometry — what the route gives up by
    // flipping (the flat assignment is the wall-time loser the flip
    // avoids; its recall at matched nProbe is the bar)
    for (nProbe <- npGrid) {
      val t0 = System.nanoTime()
      val approx = graft.ops.Similarity.ivfTopK(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", cents, k = k, nProbe = nProbe)
      val hit = truth.join(approx.select(col("qid"), col("id")),
        Seq("qid", "id")).count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"""{"index":"flat_c$cells","nprobe":$nProbe,""" +
        f""""recall_bp":${hit * 10000.0 / (qn * k)}%.0f,""" +
        f""""corpus":$nCorpus,"cells":$cells,"wall_s":$wall%.2f}""")
    }

    // TWO-LEVEL rows: the auto route's exact derivation
    // (twoLevelBranches, fitted tops, replicated fines) across the
    // branchProbes × replicas grid, bracketing the registered defaults
    val branches = graft.ops.Similarity.twoLevelBranches(cells)
    for (replicas <- rGrid; bp <- bpGrid; nProbe <- npGrid) {
      val (tops, fines) = graft.ops.Similarity.twoLevelIndexFitted(
        cents, branches, iters = 2, replicas = replicas)
      val t0 = System.nanoTime()
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("cos").desc, col("id").asc)
      val items2 = emb.select(col("vec_id").as("id"), col("embedding"),
        graft.ops.Similarity.ivfCell2L(col("embedding"), tops, fines, bp)
          .as("c"))
      val q2 = queries.select(col("vec_id").as("qid"),
        col("embedding").as("qv"),
        explode(graft.ops.Similarity.ivfProbes2L(
          col("embedding"), tops, fines, bp, nProbe)).as("c"))
      val approx = items2.join(q2, Seq("c"))
        .filter(col("qid") =!= col("id"))
        .withColumn("cos",
          graft.ops.Similarity.cosine(col("embedding"), col("qv")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
      val hit = truth.join(approx.select(col("qid"), col("id")),
        Seq("qid", "id")).count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"""{"index":"2l_c${cells}_b${branches}_r$replicas",""" +
        f""""branch_probes":$bp,"nprobe":$nProbe,""" +
        f""""recall_bp":${hit * 10000.0 / (qn * k)}%.0f,""" +
        f""""corpus":$nCorpus,"cells":$cells,"wall_s":$wall%.2f}""")
    }
    spark.stop()
  }
}
