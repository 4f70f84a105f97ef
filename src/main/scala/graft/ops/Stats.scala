package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-monitoring statistics over grouped numeric columns.
  *
  * The house rule applies doubly here: a z-score cut `|v − μ| > z·σ`
  * computed in floats flips rows at the boundary across engines (μ and
  * σ are accumulation-order-dependent), and a monitoring operator whose
  * flags differ per run is useless. Every decision below is therefore
  * an INTEGER comparison — the z-score inequality is cross-multiplied
  * into sum/sum-of-squares space, where a group's moments are exact
  * integer aggregates of an integral value column. */
object Stats {

  /** Per-row z-score outlier flags against the row's GROUP distribution
    * (population σ), decided integer-exactly: with n = group count,
    * s = Σv, q = Σv², and z = zNum/zDen,
    *
    *   |v − s/n| > z·σ   ⇔   zDen²·(n·v − s)² > zNum²·(n·q − s²)
    *
    * — both sides exact integers (DECIMAL(38,0) arithmetic, so the
    * products are exact while they fit 38 digits; with |v| ≤ 10^6 that
    * holds to n ≈ 10^12 rows per group, far past any real group). A
    * zero-variance group flags nothing (the inequality is strict).
    *
    * Scale shape: one partially-aggregated hash aggregate for the
    * per-group moments (the exchange carries one (n, s, q) row per
    * group per task) and one broadcast-or-shuffle join back — the same
    * two-pass shape as [[Sampling.temperatureResample]]; no window, no
    * sort. `valueCol` must be integral (scale your doubles to
    * units/cents first — the q36/q74 convention). Output: `df`'s
    * columns + n_group, is_outlier. */
  def outliersByGroup(df: DataFrame, groupCol: String, valueCol: String,
      zNum: Long, zDen: Long = 1L): DataFrame = {
    require(zNum > 0 && zDen > 0, s"z must be positive, got $zNum/$zDen")
    def d(c: Column) = c.cast("decimal(38,0)")
    // cast BEFORE multiplying/summing: v² and Σ accumulate in
    // decimal(38,0), never in a long that silently wraps
    val moments = df.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n_group"),
      sum(d(col(valueCol))).as("__s"),
      sum(d(col(valueCol)) * d(col(valueCol))).as("__q"))
    val lhs = d(lit(zDen * zDen)) *
      pow2(d(col("n_group")) * d(col(valueCol)) - d(col("__s")))
    val rhs = d(lit(zNum * zNum)) *
      (d(col("n_group")) * d(col("__q")) - pow2(d(col("__s"))))
    df.join(moments, Seq(groupCol))
      .withColumn("is_outlier", lhs > rhs)
      .drop("__s", "__q")
  }

  private def pow2(c: Column): Column = c * c

  /** Per-group quantile binning — each row's bucket (1..boundaries+1)
    * within its group's own value distribution, e.g. per-language
    * quality quartiles for mixture weighting ("upsample the top
    * quartile of each language" — binning against the GLOBAL
    * distribution would just re-rank languages).
    *
    * The naive shape is `ntile() OVER (PARTITION BY group ORDER BY v)`
    * — a corpus-wide per-group sort. This instead aggregates the
    * boundary quantiles per group (`percentile_approx`, accuracy
    * 10000: exact order statistics whenever a group is smaller than
    * the accuracy, bounded-error beyond — the q45 contract) into a
    * GROUPS-sized table and broadcast-joins it back: one partial
    * aggregate + one stateless comparison pass, no sort of the corpus.
    * Bucket = 1 + |{b : v > boundary_b}| — strict-greater integer
    * comparisons, so ties on a boundary all land in the lower bucket
    * on every engine. Output: `df`'s columns + bucket. */
  def quantileBuckets(df: DataFrame, groupCol: String, valueCol: String,
      probabilities: Seq[Double]): DataFrame = {
    require(probabilities.nonEmpty && probabilities == probabilities.sorted &&
      probabilities.forall(p => p > 0 && p < 1),
      s"need sorted probabilities in (0,1), got $probabilities")
    val bounds = df.groupBy(col(groupCol)).agg(
      percentile_approx(col(valueCol),
        typedLit(probabilities), lit(10000)).as("__qs"))
    df.join(broadcast(bounds), Seq(groupCol))
      .withColumn("bucket",
        probabilities.indices.map(i =>
          when(col(valueCol) > col("__qs").getItem(i), 1L).otherwise(0L))
          .reduce(_ + _) + 1L)
      .drop("__qs")
  }
}
