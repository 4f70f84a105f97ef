package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting for training-data pipelines.
  *
  * Train/val/test assignment must be a PURE FUNCTION of the document
  * identity: reproducible across runs and engines, stable under
  * re-partitioning, and consistent when the corpus is re-processed
  * incrementally (a doc never migrates between splits when new data
  * arrives). `rand()`-based sampling has none of those properties. The
  * standard construction is a salted content/id hash bucketed into basis
  * points — one narrow codegen'd projection, no shuffle, no state. */
object Sampling {

  /** Assign each row a split label from `splits` (name → weight, weights
    * summing to ~1) by hashing `seed || id` into 10000 basis-point
    * buckets ([[Dedup.hash60]], the engine's cross-engine md5-based
    * hash, so DuckDB oracles reproduce assignments exactly). The `seed`
    * makes independent splits possible over the same corpus (new seed →
    * fresh assignment, same seed → stable). */
  def splitColumn(id: Column, splits: Seq[(String, Double)], seed: String): Column = {
    require(splits.nonEmpty, "need at least one split")
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9, s"split weights must sum to 1, got $total")
    val h = Dedup.hash60(concat(lit(seed), id.cast("string"))) % 10000
    val bounds = splits.scanLeft(0.0)(_ + _._2).tail.map(w => math.round(w * 10000))
    // null id → null split (not the last label, which is where a null
    // hash would otherwise fall through the when-chain)
    when(id.isNull, lit(null).cast("string")).otherwise(
      splits.init.zip(bounds).foldRight(lit(splits.last._1): Column) {
        case (((name, _), bound), els) => when(h < bound, lit(name)).otherwise(els)
      })
  }

  /** [[splitColumn]] materialized as a `split` column on `df`. */
  def hashSplit(df: DataFrame, idCol: String,
      splits: Seq[(String, Double)], seed: String): DataFrame =
    df.withColumn("split", splitColumn(col(idCol), splits, seed))

  /** Per-group document cap — "at most `n` docs per domain/source", the
    * domain-diversity guard every web-scale corpus applies (a handful of
    * boilerplate-heavy domains otherwise dominate the token budget).
    * Membership must be deterministic AND exactly-n, so neither
    * `rand()` (unstable) nor a plain hash-rate filter ([[hashSample]] —
    * approximate counts) qualifies: each row is ranked within its group
    * by a salted hash and the first `n` survive, via the bounded-heap
    * [[Rank.topNPerGroup]] (n rows of state per group per task — never
    * a per-group window sort over the corpus, which is the naive
    * row_number() shape this operator exists to avoid at 100 TB).
    *
    * The ranking key is `hash60(seed || id) mod 2^52` — reduced into
    * double-exact range because the heap compares scores as doubles
    * and 60-bit longs round at 2^53 (two distinct hashes could collide
    * after rounding and flip the order an external engine computes
    * exactly); at 52 bits every value is a distinct-representable
    * double, residual collisions are real ties, and the heap's
    * ascending-id tie-break makes them deterministic cross-engine.
    * `idCol` must be integral. Output: `df`'s rows that survive. */
  def capPerGroup(df: DataFrame, groupCol: String, idCol: String,
      n: Int, seed: String): DataFrame = {
    require(n >= 1, s"n >= 1, got $n")
    val rank52 = pmod(
      Dedup.hash60(concat(lit(seed), col(idCol).cast("string"))),
      lit(1L << 52))
    // topNPerGroup keeps the HIGHEST scores: negate so the smallest
    // hash ranks first (plain ascending-hash semantics for the oracle)
    val keep = Rank.topNPerGroup(
      df.select(col(groupCol), col(idCol), (-rank52).cast("double").as("__r")),
      Seq(groupCol), idCol, "__r", n)
      .select(col("id").as(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** Leakage-safe train/val/test assignment: split by NEAR-DUP CLUSTER,
    * not by document. Hashing raw doc ids ([[hashSplit]]) puts ~two
    * members of every near-duplicate pair on opposite sides of the
    * train/test fence — the classic eval-contamination bug that survives
    * per-split dedup (each side is internally clean; the leak is across).
    * Here every document first gets its connected-component label from
    * the near-dup pair list ([[Dedup.connectedComponents]] — the q47
    * machinery), and [[splitColumn]] hashes the CLUSTER id, so a whole
    * dedup group lands in one split by construction; singleton docs are
    * their own cluster and split exactly as [[hashSplit]] would on the
    * cluster id. Split proportions are then cluster-weighted rather than
    * doc-weighted — with near-dup rates in the low percents the drift
    * from the requested weights is the same low percents, the accepted
    * cost of the guarantee (group-wise splitting is the standard remedy,
    * cf. scikit-learn's GroupShuffleSplit).
    *
    * `pairs` is any (a, b) near-dup pair list (Jaccard/MinHash/SimHash/
    * cosine families all produce one); cost is the CC iterations (probed
    * sub-linear at 10×/30×, `SCALING.md`) plus one id-keyed equi-join —
    * the split itself stays a stateless projection. Output: `df`'s
    * columns + cluster + split. */
  def leakageSafeSplit(df: DataFrame, idCol: String, pairs: DataFrame,
      splits: Seq[(String, Double)], seed: String): DataFrame = {
    val cc = Dedup.connectedComponents(pairs, df.select(col(idCol)), idCol)
    df.join(cc, Seq(idCol))
      .withColumn("split", splitColumn(col("cluster"), splits, seed))
  }

  /** Deterministic fractional sample: keep a row iff its hash bucket
    * falls below `fraction` — the same stability properties as
    * [[hashSplit]], unlike `df.sample()` (seeded per-partition, so
    * membership changes when partitioning does). */
  def hashSample(df: DataFrame, idCol: String, fraction: Double,
      seed: String): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction in [0,1], got $fraction")
    df.filter(
      Dedup.hash60(concat(lit(seed), col(idCol).cast("string"))) % 10000 <
        math.round(fraction * 10000))
  }

  /** Token-budget best-first fill — "fill each source's 1M-token
    * budget with its best documents": rows rank within their group by
    * (`scoreCol` desc, id asc) and survive while the RUNNING `costCol`
    * sum (themselves included) stays ≤ `budget` — the greedy
    * quality-knapsack every training-mix assembly runs once it has a
    * quality signal and a token budget. Greedy-prefix semantics, NOT
    * optimal knapsack: the first row that overflows the budget stops
    * the fill for its group even if a later cheaper row would still
    * fit — deterministic, one-pass, and the rule a human would audit.
    *
    * Scale shape: one hash shuffle on the group key, one in-partition
    * window pass (running sum over the (score desc, id) order) — the
    * sessionize cost model; no per-group materialization, no driver
    * loop. Null scores and null/non-positive costs never survive
    * (a zero or negative cost would break the prefix argument below).
    * Output: `df`'s surviving rows + spent (the running total through
    * each row). The prefix semantics fall out of monotonicity: with
    * strictly positive costs the running sum only grows down the
    * ranking, so `spent ≤ budget` IS the greedy prefix. */
  def budgetFill(df: DataFrame, groupCol: String, idCol: String,
      scoreCol: String, costCol: String, budget: Long): DataFrame = {
    require(budget >= 0, s"budget >= 0, got $budget")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.filter(col(scoreCol).isNotNull && col(costCol) > 0)
      .withColumn("spent", sum(col(costCol)).over(w))
      .filter(col("spent") <= budget)
  }

  /** EXACT-n deterministic global sample — "carve exactly 10k eval
    * docs out of the corpus": the n smallest salted 52-bit hashes
    * corpus-wide, via the bounded heap run as a GLOBAL aggregate
    * (n rows of state per task partial, one n-sized final merge — no
    * global sort, no sortWithinPartitions+limit scan). The global
    * form of [[capPerGroup]] with every stability property intact:
    * membership is a pure function of (id, seed), so re-runs,
    * repartitions, and appends that don't displace the n smallest
    * hashes keep the sample identical. `n` must be driver-heap small
    * (it is the final merge's state — fine to ~1e6 ids). `idCol`
    * integral. Output: `df`'s surviving rows. */
  def sampleExactN(df: DataFrame, idCol: String, n: Int,
      seed: String): DataFrame = {
    require(n >= 1, s"n >= 1, got $n")
    val rank52 = pmod(
      Dedup.hash60(concat(lit(seed), col(idCol).cast("string"))),
      lit(1L << 52))
    val keep = Rank.topNPerGroup(
      df.select(col(idCol), (-rank52).cast("double").as("__r")),
      Seq.empty, idCol, "__r", n)
      .select(col("id").as(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** Stratified exact-n sample — draw EXACTLY `n` rows overall with
    * per-group counts proportional to group sizes (largest-remainder
    * apportionment: every group gets `⌊n·c_g/N⌋`, and the `n − Σ⌊…⌋`
    * leftover seats go to the largest fractional remainders, ties by
    * group name) — the eval-set construction [[sampleExactN]] can't do
    * (a plain global draw over- and under-samples strata by √c noise)
    * and [[capPerGroup]] can't either (fixed cap ≠ proportional).
    * Selection within a group is the same deterministic ascending-
    * 52-bit-hash rank as [[capPerGroup]], so membership is re-run /
    * repartition / incremental-append stable. With n ≤ N every quota
    * provably fits its group (a +1 seat only ever lands on a positive
    * remainder); n > N degrades to keeping everything.
    *
    * Scale shape: one groups-sized count aggregate; the apportionment
    * runs entirely on that groups-sized table (the single-partition
    * window is over GROUPS, the q55 histogram convention, never the
    * corpus); selection is the bounded-heap top-k keyed per group with
    * heap bound `n` — so driver-free, sort-free, one corpus exchange.
    * The heap bound is the TOTAL `n` (quotas vary per group and the
    * heap size is fixed up front): per-task state is groups × n ids —
    * sized for eval-set n (10²–10⁵), not corpus-sized draws. `idCol`
    * must be integral. Output: `df`'s surviving rows. */
  def stratifiedExactN(df: DataFrame, groupCol: String, idCol: String,
      n: Int, seed: String): DataFrame = {
    require(n >= 1, s"n >= 1, got $n")
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__c"))
    val wAll = Window.partitionBy()
    val alloc = counts
      .withColumn("__N", sum(col("__c")).over(wAll))
      .withColumn("__base", expr(s"(${n}L * __c) div __N"))
      .withColumn("__rem", expr(s"(${n}L * __c) % __N"))
      .withColumn("__extra", lit(n.toLong) - sum(col("__base")).over(wAll))
      .withColumn("__rk", row_number().over(
        Window.orderBy(col("__rem").desc, col(groupCol).asc)))
      .withColumn("__quota", least(
        col("__base") + when(col("__rk") <= col("__extra"), 1L).otherwise(0L),
        col("__c")))
      .select(col(groupCol), col("__quota"))
    val rank52 = pmod(
      Dedup.hash60(concat(lit(seed), col(idCol).cast("string"))),
      lit(1L << 52))
    val keep = Rank.topNPerGroup(
        df.select(col(groupCol), col(idCol), (-rank52).cast("double").as("__r")),
        Seq(groupCol), idCol, "__r", n)
      .join(broadcast(alloc), Seq(groupCol))
      .filter(col("rank") <= col("__quota"))
      .select(col("id").as(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** Per-group percentile gate — "drop each source's bottom q% by this
    * score", the relative quality trim that complements an absolute
    * threshold (a uniformly weak source still contributes its best
    * rows; a strong one sheds only its own tail). The cut is
    * percentile_disc: a row survives iff its value ≥ the smallest
    * group value whose ≤-cumulative count reaches `bp` basis points of
    * the group (bp = 2500 drops the bottom quartile). All-integer
    * decision (`cum · 10⁴ ≥ n · bp`) — no float percentile
    * interpolation to diverge across engines.
    *
    * Scale shape: the corpus never sorts — the rank structure comes
    * from a (group, value) HISTOGRAM (partial-aggregated, ≪ corpus for
    * any real score column), a group-partitioned cumulative window
    * over that histogram, a groups-sized threshold table, and one
    * equi-join + stateless filter back on the corpus (the q55
    * histogram-cumsum pattern). Null-valued rows never survive.
    * Output: `df`'s surviving rows + the group's `__thr` threshold. */
  def percentileGate(df: DataFrame, groupCol: String, valueCol: String,
      bp: Int): DataFrame = {
    require(bp >= 0 && bp <= 10000, s"bp in [0, 10000], got $bp")
    val hist = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol)).agg(count(lit(1)).as("__c"))
    val cum = hist
      .withColumn("__cum", sum(col("__c")).over(
        Window.partitionBy(col(groupCol)).orderBy(col(valueCol))))
      .withColumn("__n", sum(col("__c")).over(
        Window.partitionBy(col(groupCol))))
    val thr = cum.filter(col("__cum") * 10000 >= col("__n") * bp)
      .groupBy(col(groupCol)).agg(min(col(valueCol)).as("__thr"))
    df.join(thr, Seq(groupCol))
      .filter(col(valueCol) >= col("__thr"))
  }

  /** WEIGHTED per-group cap — [[capPerGroup]] with a quality bias:
    * keep at most `n` rows per group, selected by priority sampling
    * (Duffield–Lund–Thorup): each row's priority is `w / u` with `u`
    * its deterministic hash uniform on (0, 1], and the `n` highest
    * priorities per group survive. Selection is weight-proportional-ish
    * without replacement (a row with 2× the weight is ~2× as likely to
    * make the cut), yet keeps every [[capPerGroup]] stability property:
    * re-run/repartition/incremental-append stable membership, exactly
    * min(n, group size) kept, and the bounded-heap plan (n rows of
    * state per group per task — never a per-group window sort).
    *
    * Cross-engine exactness: `u = (hash52 + 1) / 2^52` is exact (both
    * operands < 2^53, the divisor a power of two) and the single
    * division `w / u` is IEEE-correctly-rounded — bit-identical on any
    * engine, so an external oracle computes the identical priority
    * order; residual double ties break by ascending id in the heap.
    * Rows with a NULL or non-positive weight never survive (a zero
    * weight must not be electable; filter or clamp upstream if "keep
    * anyway at lowest priority" is wanted). `idCol` must be integral.
    * Output: `df`'s surviving rows. */
  def capPerGroupWeighted(df: DataFrame, groupCol: String, idCol: String,
      weight: Column, n: Int, seed: String): DataFrame = {
    require(n >= 1, s"n >= 1, got $n")
    val u = (pmod(
      Dedup.hash60(concat(lit(seed), col(idCol).cast("string"))),
      lit(1L << 52)) + lit(1L)).cast("double") / lit((1L << 52).toDouble)
    val keep = Rank.topNPerGroup(
      df.filter(weight.isNotNull && weight > 0)
        .select(col(groupCol), col(idCol),
          (weight.cast("double") / u).as("__pri")),
      Seq(groupCol), idCol, "__pri", n)
      .select(col("id").as(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** Temperature resampling — flatten a skewed group mix (languages,
    * domains, sources) toward uniform, the standard multilingual
    * pretraining recipe (mBERT/XLM: sample group g with probability
    * ∝ p_g^α, α<1). Materialized deterministically: each group keeps a
    * hash-stable subsample at rate `(n_min / n_g)^(1-α)`, so kept
    * counts are ∝ n_g^α — the smallest group survives whole and the
    * ratio between any two groups' counts is raised to the α. All the
    * [[hashSplit]] stability properties carry (re-run/repartition/
    * incremental-append stable).
    *
    * Scale shape: one partial-aggregated count per group (result rows =
    * group cardinality, i.e. tiny), a 1-row global min joined in by
    * broadcast, the rates broadcast-joined back to the corpus, then a
    * stateless hash filter — no corpus-sized shuffle anywhere.
    *
    * Cross-engine exactness: the basis-point threshold is
    * `floor(10000 · r^(1-α))`. For the α = 0.5 default the exponent is
    * computed with `sqrt`, which IEEE 754 REQUIRES to be correctly
    * rounded — bit-identical on every engine; general `pow` is only
    * faithfully rounded (≤1 ulp), so other α carry a documented
    * hair's-breadth risk of a floor boundary disagreeing with an
    * external reimplementation.
    *
    * Rows with a NULL group are dropped (equi-join semantics — null
    * never matches a rate row), matching the SQL twin exactly; assign
    * an explicit "unknown" group upstream to keep them. */
  /** Deterministic training-order shuffle into `nShards` shards — the
    * last step of a pretraining data pipeline: break curation order
    * (source/time locality would otherwise become curriculum bias) and
    * emit a reproducible (shard, shard_pos) address for every row.
    * Like everything here, the permutation is a pure function of
    * (seed, id): re-runs, repartitioning, and engine choice cannot
    * change a single row's position; a new seed is a fresh permutation.
    *
    * Mechanism: shard = id-hash mod nShards; within-shard order = an
    * INDEPENDENT second hash (different salt — reusing the shard hash
    * would sort each shard by its own bucket residue, correlating
    * position with the very value that chose the shard), id tiebreak
    * for totality. Scale shape: one hash shuffle to shards + an
    * in-shard sort — shards are sized to the cluster (each sorts
    * independently; no global sort ever exists), exactly how training
    * shards are written in production. */
  def shuffleShards(df: DataFrame, idCol: String, nShards: Int,
      seed: String): DataFrame = {
    require(nShards >= 1, s"nShards >= 1, got $nShards")
    val id = col(idCol).cast("string")
    val shard = Dedup.hash60(concat(lit(seed + "#s"), id)) % nShards
    val ord = Dedup.hash60(concat(lit(seed + "#o"), id))
    df.withColumn("shard", shard)
      .withColumn("shard_pos", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("shard")).orderBy(ord.asc, col(idCol).asc))
        .cast("long"))
  }

  /** Token-budget mixture sampling — cap each group (source, domain,
    * language) at `budget` total `weight` (typically tokens), the other
    * half of the data-mixing toolkit next to [[temperatureResample]]:
    * temperature reshapes RELATIVE proportions, a budget caps ABSOLUTE
    * contribution (e.g. "no source exceeds 50B tokens in the mix").
    * Membership is hash-stable: each row lands in one of `nBuckets`
    * hash buckets and a group keeps the longest PREFIX of buckets whose
    * running token total fits the budget — a pure function of
    * (seed, id, the group's histogram).
    *
    * Scale shape — the reason for buckets instead of a per-row cumsum:
    * an exact per-row budget needs `sum over (partition by group order
    * by hash)`, a full sort of every group, and at 100 TB one hot
    * source IS the corpus — that window is the job. Here the corpus is
    * touched by exactly two cheap passes: (1) a partial-aggregated
    * (group × bucket) weight histogram — at most |groups|·`nBuckets`
    * rows, the ONLY thing the window cumsum ever sorts; (2) a broadcast
    * join of the per-group cutoff bucket + a stateless filter. The
    * price is precision: the kept total undershoots the budget by at
    * most one bucket's weight (expected group_total/`nBuckets` — raise
    * `nBuckets` to tighten). A group whose very first bucket overshoots
    * is dropped whole rather than overshot (documented, not hidden);
    * rows with a NULL group or id are dropped (equi-join/null-hash
    * semantics, matching the SQL twin). */
  def mixtureByBudget(df: DataFrame, groupCol: String, idCol: String,
      weight: Column, budget: Long, nBuckets: Int = 1024,
      seed: String = "mix"): DataFrame = {
    require(budget > 0, s"budget > 0, got $budget")
    require(nBuckets >= 2, s"nBuckets >= 2, got $nBuckets")
    val bucket =
      Dedup.hash60(concat(lit(seed), col(idCol).cast("string"))) % nBuckets
    val bucketed = df.withColumn("__b", bucket)
    val hist = bucketed.groupBy(col(groupCol), col("__b"))
      .agg(sum(weight).as("__w"))
    val cum = hist.withColumn("__cum",
      sum(col("__w")).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col(groupCol)).orderBy(col("__b"))))
    val cut = cum.filter(col("__cum") <= budget)
      .groupBy(col(groupCol)).agg(max(col("__b")).as("__cut"))
    bucketed.join(broadcast(cut), groupCol)
      .filter(col("__b") <= col("__cut"))
      .drop("__b", "__cut")
  }

  def temperatureResample(df: DataFrame, groupCol: String, idCol: String,
      alpha: Double = 0.5, seed: String = "temp"): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha in (0,1], got $alpha")
    val counts = df.groupBy(groupCol).agg(count(lit(1)).as("__n"))
    val nMin = counts.agg(min(col("__n")).as("__n_min"))
    val ratio = col("__n_min").cast("double") / col("__n")
    val scaled =
      (if (alpha == 0.5) sqrt(ratio) else pow(ratio, 1.0 - alpha)) * 10000
    val rates = counts.crossJoin(broadcast(nMin))
      .select(col(groupCol), floor(scaled).as("__keep_bp"))
    df.join(broadcast(rates), groupCol)
      .filter(
        Dedup.hash60(concat(lit(seed), col(idCol).cast("string"))) % 10000 <
          col("__keep_bp"))
      .drop("__keep_bp")
  }
}
