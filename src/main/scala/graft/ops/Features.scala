package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tabular feature engineering for training pipelines — encodings of
  * categorical columns computed AS TABLES (categories × folds rows, not
  * corpus rows): the downstream per-row application is one broadcast
  * join, and the table itself is a corpus-keyed aggregate the training
  * job persists next to the model (the encoding IS a model parameter —
  * recomputing it implicitly at serving time is the classic skew bug).
  *
  * Determinism discipline: fold assignment is the pure md5-hash
  * function of (seed, id) used by [[Sampling.hashSplit]] — stable under
  * repartitioning, reproducible cross-engine — and every statistic is
  * an exact integer aggregate; the only doubles are final display
  * ratios computed as one fixed IEEE sequence rounded to 6 dp. */
object Features {

  /** Leakage-safe (out-of-fold) target encoding: for every
    * (category, fold), the mean of `targetCol` over the category's rows
    * in the OTHER folds — the value a row in that fold is allowed to
    * see without reading its own label (mean-encoding with in-fold rows
    * included is target leakage: the encoded feature memorizes each
    * row's own label and cross-validation silently overfits).
    *
    *   fold(id)  = hash60(seed‖id) mod folds
    *   enc(c, f) = (Σ_c target − Σ_{c,f} target) / (n_c − n_{c,f})
    *
    * Scale shape: ONE corpus-keyed (category, fold) aggregate; the
    * per-category totals come from re-aggregating that (categories ×
    * folds)-sized table, never a second corpus pass; output is the
    * encoding table (categories × folds rows). Exact integer
    * numerator/denominator are emitted alongside the 6-dp display mean;
    * a category entirely inside one fold has no out-of-fold evidence —
    * its enc is NULL (the consumer falls back to the global prior),
    * never a fabricated number. Output: catCol, fold, n_oof, sum_oof,
    * enc. */
  def targetEncode(df: DataFrame, catCol: String, targetCol: String,
      idCol: String, folds: Int, seed: String): DataFrame = {
    require(folds >= 2 && folds <= 1000, s"folds in [2, 1000], got $folds")
    val fold = pmod(Dedup.hash60(concat(lit(seed), col(idCol).cast("string"))),
      lit(folds.toLong))
    val perFold = df.select(col(catCol), fold.as("fold"),
        col(targetCol).cast("long").as("__t"))
      .groupBy(col(catCol), col("fold"))
      .agg(count(lit(1)).as("__n"), sum(col("__t")).as("__s"))
    val totals = perFold.groupBy(col(catCol))
      .agg(sum(col("__n")).as("__nt"), sum(col("__s")).as("__st"))
    // categories missing a fold entirely still need that fold's row
    // (enc = the category's full mean): build the complete grid
    val grid = totals.select(col(catCol), col("__nt"), col("__st"))
      .crossJoin(broadcast(
        df.sparkSession.range(folds.toLong).select(col("id").as("fold"))))
    grid.join(perFold, Seq(catCol, "fold"), "left")
      .select(col(catCol), col("fold"),
        (col("__nt") - coalesce(col("__n"), lit(0L))).as("n_oof"),
        (col("__st") - coalesce(col("__s"), lit(0L))).as("sum_oof"))
      .withColumn("enc", expr(
        "CASE WHEN n_oof > 0 THEN round(CAST(sum_oof AS DOUBLE)" +
          " / CAST(n_oof AS DOUBLE), 6) ELSE NULL END"))
  }

  /** Count/frequency encoding table: per category, the exact row count
    * and its basis-point share of the corpus — the cheap high-cardinality
    * encoding (rank-preserving, no label, no leakage concern). One
    * corpus-keyed aggregate + a 1-row total joined back broadcast.
    * Output: catCol, n, freq_bp. */
  def countEncode(df: DataFrame, catCol: String): DataFrame = {
    val counts = df.groupBy(col(catCol)).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("__total"))
    counts.crossJoin(broadcast(total))
      .select(col(catCol), col("n"),
        expr("CAST((n * 10000) div __total AS BIGINT)").as("freq_bp"))
  }
}
