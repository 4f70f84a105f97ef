package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev-only SEED-QUALITY audit (r19 verdict item 6): the registered
  * quantizer seeds from the id PREFIX, which is a stratified draw only
  * when id order does not correlate with content. This instrument runs
  * [[graft.ops.Similarity.seedCoverageReport]] (q178's operator) over
  * two shapes of the SAME corpus and prints one JSON summary line per
  * shape:
  *
  *  - `fixture`: ids as shipped (this corpus interleaves its label
  *    clusters — the accidental stratification the registered rule
  *    relies on here);
  *  - `sorted_ids`: ids REASSIGNED in (label, vec_id) order — the
  *    adversarial corpus whose prefix is all one cluster (a crawl
  *    partitioned by source/date has exactly this shape).
  *
  * The summary is the actionable number: what fraction of the corpus
  * lives in sign-cells the seed prefix never reaches (`uncovered_mass_
  * bp`). SCALING.md records both rows; a deployment alerts on the
  * audit before paying a fit whose recall bad seeds have already
  * capped (measured −2,900 bp, not recovered by Lloyd depth). */
object SeedAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()
    val n = emb.filter(col("embedding").isNotNull).count()
    val kc = math.max(2,
      math.ceil(n / SparkEntry.TargetCellOcc.toDouble).toInt)
    // the adversarial shape: same vectors, ids reassigned so the id
    // order IS the label order — the prefix seeds all land in the
    // first cluster(s)
    val sorted = emb.select(
      (row_number().over(Window.orderBy(col("label"), col("vec_id")))
        .cast("long") - 1L).as("vec_id"),
      col("embedding"), col("label"))
    for ((shape, df) <- Seq("fixture" -> emb.toDF, "sorted_ids" -> sorted)) {
      val rep = graft.ops.Similarity.seedCoverageReport(
        df, "vec_id", "embedding", nSeeds = kc, signBits = 4)
      val s = rep.agg(
        count(lit(1)).as("cells"),
        sum(col("covered")).as("covered_cells"),
        sum(col("n_corpus")).as("mass"),
        sum(when(col("covered") === 0L, col("n_corpus")).otherwise(0L))
          .as("uncovered_mass"),
        max(col("n_corpus")).as("max_cell")).collect().head
      val cells = s.getLong(0); val cov = s.getLong(1)
      val mass = s.getLong(2); val unc = s.getLong(3)
      println(f"""{"audit":"seed_coverage","shape":"$shape","seeds":$kc,""" +
        f""""sign_cells":$cells,"covered_cells":$cov,""" +
        f""""uncovered_mass_bp":${unc * 10000.0 / mass}%.0f,""" +
        f""""max_cell":${s.getLong(4)},"corpus":$n}""")
    }
    spark.stop()
  }
}
