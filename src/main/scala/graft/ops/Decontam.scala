package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that overlap an
  * evaluation/benchmark set, by word n-gram shingles — the standard
  * contamination test (a doc containing benchmark n-grams leaks eval
  * answers into training).
  *
  * Scale shape: the benchmark side is SMALL (eval sets are thousands of
  * docs vs a 100 TB corpus) — its distinct shingle-hash set broadcasts;
  * the corpus side explodes to one row per (doc, shingle) and probes the
  * broadcast hash set. No shuffle touches the corpus until the per-doc
  * count aggregate, which partial-aggregates map-side. The 60-bit
  * shingle hash is the engine's cross-engine md5 form, so oracles
  * reproduce the overlap exactly. */
object Decontam {

  /** Per-document overlap against the benchmark shingle set: `n_shingles`
    * (distinct shingles in the doc), `n_contam` (of those, how many
    * appear anywhere in the benchmark), `contam_frac` (their ratio,
    * 6 dp). Docs with fewer than `n` words have no shingles and are
    * absent, matching the near-dup operators' convention. */
  def overlapProfile(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, text: Column, n: Int): DataFrame = {
    val bset = benchmark
      .select(explode(graft.functions.ShingleHashesFn(text, n)).as("sh"))
      .distinct()
    val sh = corpus
      .filter(size(split(text, " ")) >= n)
      .select(col(idCol), graft.functions.ShingleHashesFn(text, n).as("__shs"))
      .select(col(idCol), size(col("__shs")).cast("long").as("n_shingles"),
        explode(col("__shs")).as("sh"))
    sh.join(broadcast(bset.withColumn("__hit", lit(1))), Seq("sh"), "left")
      .groupBy(col(idCol), col("n_shingles"))
      .agg(count(col("__hit")).as("n_contam"))
      .withColumn("contam_frac",
        round(col("n_contam").cast("double") / col("n_shingles"), 6))
  }

  /** The consumer half: drop corpus docs whose benchmark overlap reaches
    * `maxFrac` (keep docs below it, and docs with no shingles — they
    * cannot be contaminated by n-gram evidence). */
  def dropContaminated(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, text: Column, n: Int, maxFrac: Double): DataFrame = {
    val bad = overlapProfile(corpus, benchmark, idCol, text, n)
      .filter(col("contam_frac") >= maxFrac).select(col(idCol))
    corpus.join(bad, Seq(idCol), "left_anti")
  }
}
