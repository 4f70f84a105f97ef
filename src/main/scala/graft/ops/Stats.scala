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

  /** Per-group linear drift of an integral metric `yCol` against an
    * integral axis `xCol` (e.g. value against day index: "is this
    * event type's value drifting over time?") — the monitoring
    * statistic behind data-freshness and distribution-shift alarms,
    * computed from EXACT integer moments in the [[outliersByGroup]]
    * discipline: per group n, Σx, Σy, Σx², Σy², Σxy accumulate in
    * DECIMAL(38,0), the centered forms covN = n·Σxy − Σx·Σy and
    * varN = n·Σx² − (Σx)² are exact, and floats appear only in the
    * LAST step — one correctly-rounded decimal→double cast per moment
    * and a fixed IEEE tree, identical on any engine:
    *
    *   slope        = covN / varxN                      (OLS, 6 dp)
    *   corr2_signed = sign(covN) · covN² / (varxN·varyN) (6 dp)
    *
    * corr2_signed is the SQUARED Pearson correlation carrying the
    * sign — monotone in r for thresholding and sign-faithful for
    * direction, with no √ (whose libm rounding differs per engine; the
    * q58/q82 reasoning). Zero-variance groups yield null slope/corr
    * rather than a division artifact. Exactness bound: the moment
    * products fit 38 digits while n·|x|²·|y| stays under ~10^38 —
    * |x| ≤ 10^4, |y| ≤ 10^6 holds to n ≈ 10^12 rows per group; rescale
    * the axis (coarser buckets) past that.
    *
    * Scale shape: ONE partially-aggregated hash aggregate (the
    * exchange carries one 6-moment row per group per task); the result
    * is groups-sized. No join back, no window, no sort. Output:
    * groupCol, n, slope, corr2_signed. */
  def driftByGroup(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    def d(c: Column) = c.cast("decimal(38,0)")
    val m = df.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n"),
      sum(d(col(xCol))).as("__sx"),
      sum(d(col(yCol))).as("__sy"),
      sum(d(col(xCol)) * d(col(xCol))).as("__sxx"),
      sum(d(col(yCol)) * d(col(yCol))).as("__syy"),
      sum(d(col(xCol)) * d(col(yCol))).as("__sxy"))
    val covN = d(col("n")) * col("__sxy") - col("__sx") * col("__sy")
    val varxN = d(col("n")) * col("__sxx") - pow2(col("__sx"))
    val varyN = d(col("n")) * col("__syy") - pow2(col("__sy"))
    val covD = covN.cast("double")
    val sign = when(covN < 0, -1.0).otherwise(1.0)
    m.select(col(groupCol), col("n"),
      when(varxN === 0, lit(null).cast("double"))
        .otherwise(round(covD / varxN.cast("double"), 6)).as("slope"),
      when(varxN === 0 || varyN === 0, lit(null).cast("double"))
        .otherwise(round(sign * covD * covD /
          (varxN.cast("double") * varyN.cast("double")), 6))
        .as("corr2_signed"))
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

  /** Per-group winsorized mean of an integral metric: values are
    * clamped to the group's own [lo, hi] quantile boundaries before
    * averaging — the robust central-tendency monitoring statistic (a
    * handful of 10^7-char documents should not move a language's mean
    * quality length; trimming drops rows, winsorizing keeps corpus
    * mass and is the standard choice when downstream weights depend on
    * n). Boundaries come from the [[quantileBuckets]] sketch (exact
    * order statistics below percentile_approx's accuracy — the
    * q45/q81 contract); clamped and raw sums accumulate as exact
    * integers (`valueCol` integral, the q36/q76 convention) and the
    * only float step is one final exact-sum / count division per
    * group, 6 dp.
    *
    * Scale shape: one partially-aggregated quantile sketch (groups-
    * sized result, broadcast back), one clamp projection, one
    * partially-aggregated sum — the [[quantileBuckets]] shape plus a
    * constant-cost pass; the corpus is never sorted. Output: groupCol,
    * n, lo_bound, hi_bound, mean_raw, mean_winsorized. */
  def winsorizedMean(df: DataFrame, groupCol: String, valueCol: String,
      lo: Double, hi: Double): DataFrame = {
    require(lo > 0 && hi < 1 && lo < hi, s"need 0 < lo < hi < 1, got ($lo, $hi)")
    val bounds = df.groupBy(col(groupCol)).agg(
      percentile_approx(col(valueCol),
        typedLit(Seq(lo, hi)), lit(10000)).as("__qs"))
    val clamped = greatest(col("__qs").getItem(0),
      least(col(valueCol), col("__qs").getItem(1)))
    df.join(broadcast(bounds), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        first(col("__qs").getItem(0)).cast("long").as("lo_bound"),
        first(col("__qs").getItem(1)).cast("long").as("hi_bound"),
        sum(col(valueCol).cast("decimal(38,0)")).as("__sr"),
        sum(clamped.cast("decimal(38,0)")).as("__sw"))
      .select(col(groupCol), col("n"), col("lo_bound"), col("hi_bound"),
        round(col("__sr").cast("double") / col("n").cast("double"), 6)
          .as("mean_raw"),
        round(col("__sw").cast("double") / col("n").cast("double"), 6)
          .as("mean_winsorized"))
  }

  /** Per-group dataset card — the corpus-report stage of a curation
    * pipeline ("what is in this source?"): row count, exact total of a
    * size column, distinct sub-group count (e.g. languages), and the
    * Shannon entropy of the sub-group distribution. The entropy is the
    * house integer trick applied to −Σ p·ln p: each (group, sub) term
    * is rounded to exact MICRO-NAT longs, so the per-group sum is
    * order-free and bit-identical across engines; only the final /1e6
    * is float (6 dp).
    *
    * Scale shape: ONE corpus scan into one partially-aggregated hash
    * aggregate keyed (group, sub) — the exchange carries one row per
    * (group, sub) per task; everything after (the group-total window
    * and the final per-group roll-up) runs over the (groups × subs)-
    * sized table. Sums go through DECIMAL(38,0) so a 100 TB char total
    * cannot silently wrap a long. Output: groupCol, n_rows,
    * total_size, n_subgroups, entropy_micro, entropy. */
  def groupCard(df: DataFrame, groupCol: String, subCol: String,
      sizeCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cl = df.groupBy(col(groupCol), col(subCol))
      .agg(count(lit(1)).as("__c"),
        sum(col(sizeCol).cast("decimal(38,0)")).as("__s"))
    val p = col("__c").cast("double") / col("__n").cast("double")
    cl.withColumn("__n",
        sum(col("__c")).over(Window.partitionBy(col(groupCol))))
      .withColumn("__e", round(p * log(p) * lit(-1000000.0)).cast("long"))
      .groupBy(col(groupCol))
      .agg(first(col("__n")).as("n_rows"),
        sum(col("__s")).cast("long").as("total_size"),
        count(lit(1)).as("n_subgroups"),
        sum(col("__e")).as("entropy_micro"))
      .select(col(groupCol), col("n_rows"), col("total_size"),
        col("n_subgroups"), col("entropy_micro"),
        round(col("entropy_micro").cast("double") / lit(1000000.0), 6)
          .as("entropy"))
  }

  /** Per-group multi-percentile summary in ONE histogram pass — the
    * p25/p50/p75/p95 digest a corpus report publishes per source. Every
    * cut is percentile_disc under the [[Sampling.percentileGate]]
    * integer rule (smallest value whose ≤-cumulative count reaches the
    * basis points), so each reported percentile is an observed value
    * and the decision has no float interpolation to diverge across
    * engines.
    *
    * Scale shape: one corpus-sized (group, value) hash-aggregate
    * histogram; the cumulative window and the per-bp minima all run on
    * the histogram (all `bps` ride the SAME window pass — k percentiles
    * cost one scan, not k); output is groups-sized. `valueCol` must be
    * integral. Output: groupCol, n_rows, one `p<bp>` column per
    * requested basis point. */
  def percentilesDisc(df: DataFrame, groupCol: String, valueCol: String,
      bps: Seq[Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(bps.nonEmpty && bps.forall(bp => bp >= 0 && bp <= 10000) &&
      bps.distinct == bps, s"bps must be distinct in [0, 10000], got $bps")
    val cum = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol)).agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(
        Window.partitionBy(col(groupCol)).orderBy(col(valueCol))))
      .withColumn("__n", sum(col("__c")).over(
        Window.partitionBy(col(groupCol))))
    cum.groupBy(col(groupCol))
      .agg(first(col("__n")).as("n_rows"),
        bps.map(bp => min(when(col("__cum") * 10000 >= col("__n") * bp,
          col(valueCol))).as(s"p$bp")): _*)
  }

  /** Robust per-group outlier flags — median/MAD instead of mean/σ
    * ([[outliersByGroup]]'s moment space is itself dragged by the very
    * outliers it hunts; the median absolute deviation is breakdown-50%
    * robust). Per group: the lower median (smallest v with cumulative
    * count ≥ half — the [[Sampling.percentileGate]] disc convention, so
    * it is always an observed integral value), MAD = the same median
    * over |v − median|, and a per-row flag `|v − median| > k·MAD` with
    * `k = kNum/kDen` decided as an EXACT integer cross-multiplication —
    * no float ulp can flip a boundary row between engines. A
    * zero-MAD group (> half its rows at the median) flags only rows
    * strictly off the median when kNum is 0 — with the default k=3 it
    * flags any deviation > 0 only if 3·0 < dev, i.e. every off-median
    * row; that is the textbook MAD=0 degeneracy, left to the caller's
    * choice of k (document, don't special-case).
    *
    * Scale shape: ONE corpus-sized hash aggregate builds the (group,
    * value) histogram; the median, the deviation histogram (derived
    * from the first histogram, NOT a second corpus pass), and the MAD
    * all run over histogram-sized tables with groups-keyed windows;
    * one join keyed on the group flags the rows. `valueCol` must be
    * integral. Output: `df`'s columns + median, mad, is_outlier. */
  def medianMad(df: DataFrame, groupCol: String, valueCol: String,
      kNum: Long = 3L, kDen: Long = 1L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(kNum >= 0 && kDen > 0, s"need kNum >= 0, kDen > 0, got $kNum/$kDen")
    def discMedian(hist: DataFrame, vCol: String, out: String) = hist
      .withColumn("__cum", sum(col("__c")).over(
        Window.partitionBy(col(groupCol)).orderBy(col(vCol))))
      .withColumn("__n", sum(col("__c")).over(
        Window.partitionBy(col(groupCol))))
      .filter(col("__cum") * 2 >= col("__n"))
      .groupBy(col(groupCol)).agg(min(col(vCol)).as(out))
    val hist = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol)).agg(count(lit(1)).as("__c"))
    val med = discMedian(hist, valueCol, "median")
    val devHist = hist.join(med, Seq(groupCol))
      .groupBy(col(groupCol), abs(col(valueCol) - col("median")).as("__dev"))
      .agg(sum(col("__c")).as("__c"))
    val mad = discMedian(devHist, "__dev", "mad")
    df.join(med, Seq(groupCol)).join(mad, Seq(groupCol))
      .withColumn("is_outlier",
        abs(col(valueCol) - col("median")) * kDen > col("mad") * kNum)
  }

  /** Multi-dimensional corpus summary over every subset of `dimCols` —
    * the CUBE a reporting layer asks of a curated corpus ("counts and
    * char totals by source, by language, by source × language, and
    * overall") computed in ONE pass instead of 2^d separate GROUP BYs.
    * `gid` is the grouping bitmask (bit d−1−i set ⇔ `dimCols(i)` is
    * rolled up — first dim is the most significant bit, the Spark
    * `grouping_id` convention, rebuilt from per-column `grouping` bits
    * so the oracle can mirror it engine-independently); rolled-up dims
    * read the sentinel `<all>` rather than NULL so a rolled-up cell is
    * distinguishable from a genuinely-NULL dimension value.
    *
    * Scale shape: Catalyst plans CUBE as one Expand (2^d rows per input
    * row) feeding a partially-aggregated hash aggregate — the map-side
    * combine collapses the expansion to (groups × 2^d) rows per task
    * BEFORE the one exchange, so the shuffle carries the result size,
    * not 2^d × corpus. The 2^d scan-stream amplification is CPU-only
    * and d is small by contract (require ≤ 4 ⇒ ≤ 16×); sums go through
    * DECIMAL(38,0) so a 100 TB char total cannot wrap a long. Output:
    * dimCols (string, `<all>`-coalesced), gid, n_rows, total_size. */
  def cubeSummary(df: DataFrame, dimCols: Seq[String], sizeCol: String)
      : DataFrame = {
    require(dimCols.nonEmpty && dimCols.size <= 4,
      s"cubeSummary takes 1..4 dims, got ${dimCols.size}")
    val gid = dimCols.zipWithIndex
      .map { case (c, i) =>
        grouping(col(c)).cast("long") * lit(1L << (dimCols.size - 1 - i)) }
      .reduce(_ + _)
    df.cube(dimCols.map(col): _*)
      .agg(gid.as("gid"), count(lit(1)).as("n_rows"),
        sum(col(sizeCol).cast("decimal(38,0)")).cast("long").as("total_size"))
      .select(dimCols.map(c =>
          coalesce(col(c).cast("string"), lit("<all>")).as(c)) ++
        Seq(col("gid"), col("n_rows"), col("total_size")): _*)
  }

  /** Per-group ROC AUC of a numeric score against a binary label, by
    * the exact Mann–Whitney rank statistic — the feature-screening /
    * model-eval report ("does this quality signal actually separate the
    * classes?") with NO float ranks anywhere: ties are handled by the
    * midrank convention carried as 2× the average rank (an integer:
    * `2·rank + |tie group| − 1`), so
    *
    *   U·2 = Σ_{positives} 2·avgrank − n⁺·(n⁺+1)
    *   AUC·10⁴ = (U·2 · 5000) div (n⁺·n⁻)
    *
    * is exact integer arithmetic end to end — two engines agree
    * bit-for-bit, and a 0.5000 AUC means EXACTLY uninformative.
    * The rank sum and U are quadratic in the group size (≈ n²), so
    * every intermediate — rsum2, the n⁺ products, and the u2·5000
    * numerator — is carried in DECIMAL(38,0) (DuckDB HUGEINT covers
    * the same range): in BIGINT, u2·5000 would silently wrap past
    * ~6·10⁷ balanced rows per group, rsum2 past ~3·10⁹, and
    * n⁺·(n⁺+1) past ~3·10⁹. The EMITTED u2 column is BIGINT — the
    * engine-portable output convention (exactly one emitted-type set
    * on the whole surface, see [[graft.Verify]]'s schema lint) —
    * which is exact while u2 ≤ n⁺·n⁻ ≤ n²/4 fits 2⁶³, i.e. to
    * ~6·10⁹ rows per group; auc_bp itself stays exact far beyond,
    * because its arithmetic never leaves decimal.
    *
    * Scale shape: one group-keyed rank window (the sort is the honest
    * cost of an exact rank statistic — same class as any per-group
    * ranking; for discrete scores at 100 TB, bucket first and feed the
    * histogram midranks instead) + a groups-sized aggregate. Groups
    * with no positives or no negatives report auc_bp = −1 (undefined),
    * not a fabricated 5000. Output: groupCols, n_pos, n_neg, u2
    * (= 2·U), auc_bp. */
  def groupAuc(df: DataFrame, groupCols: Seq[String], labelCol: String,
      scoreCol: String): DataFrame = {
    require(groupCols.nonEmpty, "groupAuc needs >= 1 group column")
    val gs = groupCols.map(col)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(gs: _*).orderBy(col(scoreCol).asc)
    val wt = org.apache.spark.sql.expressions.Window
      .partitionBy(gs :+ col(scoreCol): _*)
    df.select(gs ++ Seq(col(labelCol).cast("long").as("__y"), col(scoreCol)): _*)
      .withColumn("__r2",
        (lit(2L) * rank().over(w) + count(lit(1)).over(wt) - 1L)
          .cast("decimal(38,0)"))
      .groupBy(gs: _*)
      .agg(sum(col("__y")).as("n_pos"),
        (count(lit(1)) - sum(col("__y"))).as("n_neg"),
        sum(when(col("__y") === 1L, col("__r2"))
          .otherwise(lit(0L).cast("decimal(38,0)"))).as("__rsum2"))
      .select(gs ++ Seq(col("n_pos"), col("n_neg"),
        // cast n_pos BEFORE the product: n_pos*(n_pos+1) wraps BIGINT
        // at n_pos ~ 3e9, and Spark wraps silently where DuckDB errors
        (col("__rsum2") - col("n_pos").cast("decimal(38,0)") *
          (col("n_pos").cast("decimal(38,0)") + 1)).as("__u2d")): _*)
      .withColumn("auc_bp", expr(
        "CAST(CASE WHEN n_pos > 0 AND n_neg > 0 " +
          "THEN (__u2d * 5000) div (CAST(n_pos AS DECIMAL(38,0)) * n_neg) " +
          "ELSE -1 END AS BIGINT)"))
      .select(gs ++ Seq(col("n_pos"), col("n_neg"),
        col("__u2d").cast("long").as("u2"), col("auc_bp")): _*)
  }

  /** [[groupAuc]] without the per-row rank window — the 100 TB form for
    * DISCRETE scores: aggregate to the (group, score) histogram first
    * (ONE corpus-keyed hash aggregate with map-side partials), then
    * compute midranks from the histogram's running counts, where the
    * window runs over groups × distinct-scores rows, not the corpus.
    * For every score value with `n` rows of which `n⁺` positive and
    * `c` rows strictly below it, each row's 2×-average-rank is
    * `2c + n + 1`, so
    *
    *   rsum2 = Σ_values n⁺·(2c + n + 1)
    *
    * and u2/auc_bp follow exactly as in [[groupAuc]] — the two forms
    * return IDENTICAL rows (same oracle), they differ only in where the
    * sort happens: corpus-wide there, histogram-wide here. Output:
    * groupCols, n_pos, n_neg, u2, auc_bp. */
  def groupAucHist(df: DataFrame, groupCols: Seq[String], labelCol: String,
      scoreCol: String): DataFrame = {
    require(groupCols.nonEmpty, "groupAucHist needs >= 1 group column")
    val gs = groupCols.map(col)
    val hist = df
      .select(gs ++ Seq(col(labelCol).cast("long").as("__y"), col(scoreCol)): _*)
      .groupBy(gs :+ col(scoreCol): _*)
      .agg(count(lit(1)).as("__n"), sum(col("__y")).as("__np"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(gs: _*).orderBy(col(scoreCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    hist
      .withColumn("__c", coalesce(sum(col("__n")).over(w), lit(0L)))
      .groupBy(gs: _*)
      .agg(sum(col("__np")).as("n_pos"),
        (sum(col("__n")) - sum(col("__np"))).as("n_neg"),
        // cast BEFORE the product: one hot score value can hold ~n rows,
        // so __np · (2c + n + 1) ~ n² would wrap in BIGINT pre-cast
        sum(col("__np").cast("decimal(38,0)") *
          (lit(2L) * col("__c") + col("__n") + 1L)).as("__rsum2"))
      .select(gs ++ Seq(col("n_pos"), col("n_neg"),
        (col("__rsum2") - col("n_pos").cast("decimal(38,0)") *
          (col("n_pos").cast("decimal(38,0)") + 1)).as("__u2d")): _*)
      .withColumn("auc_bp", expr(
        "CAST(CASE WHEN n_pos > 0 AND n_neg > 0 " +
          "THEN (__u2d * 5000) div (CAST(n_pos AS DECIMAL(38,0)) * n_neg) " +
          "ELSE -1 END AS BIGINT)"))
      .select(gs ++ Seq(col("n_pos"), col("n_neg"),
        col("__u2d").cast("long").as("u2"), col("auc_bp")): _*)
  }

  /** Score calibration table — the reliability companion to
    * [[groupAuc]]: bucket rows by the score's own per-group quantiles
    * (the [[quantileBuckets]] sketch) and report each bucket's exact
    * positive rate in basis points. AUC says the score RANKS well;
    * calibration says what a score REGION actually means — a quality
    * classifier can have AUC 0.9 and still be useless as a threshold
    * gate if the top bucket is only 40% positive. All integers: counts,
    * integer-div basis points, and the bucket's exact [lo, hi] score
    * span. Scale shape: the quantileBuckets sketch + one (group,
    * bucket)-keyed aggregate. Output: groupCol, bucket, n, n_pos,
    * score_lo, score_hi, pos_rate_bp. */
  def calibrationTable(df: DataFrame, groupCol: String, labelCol: String,
      scoreCol: String, probabilities: Seq[Double]): DataFrame =
    quantileBuckets(df, groupCol, scoreCol, probabilities)
      .groupBy(col(groupCol), col("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(col(labelCol).cast("long")).as("n_pos"),
        min(col(scoreCol)).cast("long").as("score_lo"),
        max(col(scoreCol)).cast("long").as("score_hi"))
      .withColumn("pos_rate_bp",
        expr("CAST((n_pos * 10000) div n AS BIGINT)"))

  /** Per-segment two-arm A/B comparison (Welch): integer moments per
    * arm (n, Σx, Σx² — exact BIGINT aggregates of an integral metric),
    * then the z² statistic as ONE FIXED double-arithmetic expression
    * over those integers, rounded to 6 dp — the cosine-oracle
    * discipline: both engines evaluate the identical IEEE operation
    * sequence on identical integers, so the rounded statistic and the
    * significance verdict cannot disagree, while the statistic itself
    * stays a real Welch z² (a fully-exact rational form overflows
    * DECIMAL(38) at corpus-scale moments — measured, not guessed).
    *
    *   z² = (m_a − m_b)² / (v_a/n_a + v_b/n_b),
    *   m = S/n (double), v = (Q − S·m)/(n − 1)
    *
    * `significant` compares the ROUNDED z² against (critBp/10⁴)² —
    * the decision is a deterministic function of the emitted number.
    * Segments where either arm has n < 2 are dropped (variance
    * undefined), and so are segments where BOTH arms have zero
    * variance (the metric is constant within each arm: pooled
    * denominator 0, z² = ±Infinity/NaN — engines diverge casting
    * those, and "identical constants vs different constants" is a
    * question a variance test cannot answer anyway). Zero variance is
    * decided exactly in integers: v = 0 ⇔ n·Q = S². One corpus-keyed
    * aggregate, segments-sized everything after. Output: segmentCols,
    * n_a, n_b, sum_a, sum_b, z2 (6 dp), significant (0/1 long). */
  def abTest(df: DataFrame, segmentCols: Seq[String], armCol: String,
      armA: String, armB: String, valueCol: String,
      critBp: Long = 19600L): DataFrame = {
    require(segmentCols.nonEmpty, "abTest needs >= 1 segment column")
    require(armA != armB, "arms must differ")
    require(critBp >= 0, s"critBp >= 0, got $critBp")
    val gs = segmentCols.map(col)
    val v = col(valueCol).cast("long")
    val arm = col(armCol)
    def m(a: String, f: Column) =
      sum(when(arm === a, f).otherwise(lit(0L)))
    val agg = df.filter(arm === armA || arm === armB)
      .groupBy(gs: _*)
      .agg(m(armA, lit(1L)).as("n_a"), m(armB, lit(1L)).as("n_b"),
        m(armA, v).as("sum_a"), m(armB, v).as("sum_b"),
        m(armA, v * v).as("__q_a"), m(armB, v * v).as("__q_b"))
      .filter(col("n_a") >= 2L && col("n_b") >= 2L)
      // drop both-arms-constant segments (zero pooled variance — see
      // scaladoc); n·Q = S² decided in DECIMAL(38,0) so corpus-scale
      // moments can't wrap the comparison itself
      .filter(!(col("__q_a").cast("decimal(38,0)") * col("n_a") ===
          col("sum_a").cast("decimal(38,0)") * col("sum_a") &&
        col("__q_b").cast("decimal(38,0)") * col("n_b") ===
          col("sum_b").cast("decimal(38,0)") * col("sum_b")))
    // one fixed IEEE operation sequence, stated identically in the
    // DuckDB twin — explicit multiply for the square (pow(x, 2) is
    // libm territory; x·x is one exact IEEE multiply on both engines)
    val z2 = expr(
      """round(
        |  (CAST(sum_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |    - CAST(sum_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        |  * (CAST(sum_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |    - CAST(sum_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        |  / ((CAST(__q_a AS DOUBLE) - CAST(sum_a AS DOUBLE)
        |       * (CAST(sum_a AS DOUBLE) / CAST(n_a AS DOUBLE)))
        |      / CAST(n_a - 1 AS DOUBLE) / CAST(n_a AS DOUBLE)
        |   + (CAST(__q_b AS DOUBLE) - CAST(sum_b AS DOUBLE)
        |       * (CAST(sum_b AS DOUBLE) / CAST(n_b AS DOUBLE)))
        |      / CAST(n_b - 1 AS DOUBLE) / CAST(n_b AS DOUBLE)), 6)""".stripMargin)
    // decide on z2 scaled to an integer (round-6 z2 × 10⁶ is integral up
    // to fp dust that round() clears) against critBp²/100 — an integer
    // comparison both engines state identically; no squared-double
    // literal whose binary value the oracle would have to reproduce
    // (for 0/1 CONVERSION metrics prefer [[proportionAb]], which needs
    // no variance estimate and decides fully exactly)
    agg.withColumn("z2", z2)
      .withColumn("significant",
        (expr("CAST(round(z2 * 1000000) AS BIGINT)") >=
          lit(critBp * critBp / 100L)).cast("long"))
      .select(gs ++ Seq(col("n_a"), col("n_b"), col("sum_a"), col("sum_b"),
        col("z2"), col("significant")): _*)
  }

  /** Two-proportion A/B z-test (pooled), decided FULLY EXACTLY — the
    * conversion-rate comparison where, unlike [[abTest]]'s estimated
    * variance, everything is rational in the four counts, so the whole
    * inequality cross-multiplies into integers:
    *
    *   z² ≥ (critBp/10⁴)²  ⇔
    *   L·10⁸ ≥ R  where  L = (k_a·n_b − k_b·n_a)²·N,
    *                     R = critBp²·K·(N−K)·n_a·n_b
    *
    * with K = k_a + k_b, N = n_a + n_b — evaluated in DECIMAL(38,0)
    * (DuckDB HUGEINT mirrors it) behind a magnitude guard: when
    * L ≥ 10³⁰ the product L·10⁸ would need 39 digits, but then
    * L·10⁸ ≥ 10³⁸ > R for ANY representable R, so the verdict is
    * `true` without forming it (a short-circuiting CASE, stated
    * identically in both engines — DuckDB errors on int128 overflow
    * rather than NULLing, so the guard is what keeps the engines
    * agreeing at the extremes). Exact for per-arm n up to ~2·10⁷ —
    * the binding term is R ≈ critBp²·n⁴ ≤ 10³⁸ (beyond that, test on
    * a deterministic hash sample — the verdict at that scale is
    * insensitive to sampling). Degenerate
    * pooled variance (K = 0 or K = N: both arms all-failures or
    * all-successes ⇒ p̂_a = p̂_b) reports insignificant, not a 0 ≥ 0
    * accident. One corpus-keyed aggregate. Output: segmentCols, n_a,
    * k_a, n_b, k_b, significant (0/1 long). */
  def proportionAb(df: DataFrame, segmentCols: Seq[String], armCol: String,
      armA: String, armB: String, successCol: String,
      critBp: Long = 19600L): DataFrame = {
    require(segmentCols.nonEmpty, "proportionAb needs >= 1 segment column")
    require(armA != armB, "arms must differ")
    require(critBp >= 0, s"critBp >= 0, got $critBp")
    val gs = segmentCols.map(col)
    val arm = col(armCol)
    val succ = col(successCol).cast("long")
    def m(a: String, f: Column) = sum(when(arm === a, f).otherwise(lit(0L)))
    df.filter(arm === armA || arm === armB)
      .groupBy(gs: _*)
      .agg(m(armA, lit(1L)).as("n_a"), m(armA, succ).as("k_a"),
        m(armB, lit(1L)).as("n_b"), m(armB, succ).as("k_b"))
      .filter(col("n_a") >= 1L && col("n_b") >= 1L)
      .withColumn("__l", expr(
        """(CAST(k_a AS DECIMAL(38,0)) * n_b - CAST(k_b AS DECIMAL(38,0)) * n_a)
          |* (CAST(k_a AS DECIMAL(38,0)) * n_b - CAST(k_b AS DECIMAL(38,0)) * n_a)
          |* (n_a + n_b)""".stripMargin))
      .withColumn("significant", expr(
        s"""CAST(CASE WHEN k_a + k_b > 0 AND k_a + k_b < n_a + n_b THEN
           |  CASE WHEN __l >= CAST(${"1" + "0" * 30} AS DECIMAL(38,0)) THEN true
           |  ELSE __l * 100000000
           |    >= CAST($critBp AS DECIMAL(38,0)) * $critBp
           |       * (k_a + k_b) * (n_a + n_b - k_a - k_b) * n_a * n_b
           |  END
           |ELSE false END AS BIGINT)""".stripMargin))
      .drop("__l")
      .select(gs ++ Seq(col("n_a"), col("k_a"), col("n_b"), col("k_b"),
        col("significant")): _*)
  }
}
