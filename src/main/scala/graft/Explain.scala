package graft
import org.apache.spark.sql.SparkSession

/** Plan-audit utility.
  *
  * Print mode (`runMain graft.Explain <sfDir> [query ...]`): prints the
  * formatted physical plan of the named queries (default: a representative
  * set) so scan pruning, pushed filters, broadcast joins, and
  * whole-stage-codegen spans can be inspected.
  *
  * Check mode (`runMain graft.Explain --check [sfDir]`): plan-regression
  * gate over EVERY registered query — fails (exit 1) on plan shapes that
  * are correct-but-wrong-at-scale and don't show up as test failures:
  *   - a `CartesianProduct` anywhere (an unconstrained all-pairs join;
  *     the only sanctioned cross join is against a broadcast-tiny query
  *     set, which plans as BroadcastNestedLoopJoin, not CartesianProduct);
  *   - a global-table join that is not a broadcast hash join (a shuffle
  *     of the big side against a dimension that fits in memory);
  *   - a CPU-heavy query (per-row hash/JSON/cosine work) whose plan lost
  *     its scatter exchange — on the single-row-group testdata layout the
  *     scan plans 1 partition, and without `RoundRobinPartitioning` all
  *     per-row work lands on one core regardless of cluster width;
  *   - a `SortAggregate` anywhere (hash aggregation silently fell back
  *     to sorting every group's rows — the `max_by(struct)` regression
  *     class repaired in r13, now permanently gated).
  */
object Explain {

  /** Queries whose per-row CPU work must sit behind a scatter exchange on
    * the narrow testdata layout (see [[SparkEntry.cpuTable]]). */
  private val CpuHeavy = Seq(
    "q23_dedup_ngram", "q24_dedup_minhash", "q25_dedup_simhash",
    "q26_sim_topk", "q27_sim_lsh", "q28_cosine_neardup", "q37_sim_ivf",
    "q29_text_quality", "q30_text_langid", "q31_token_count",
    "q38_dedup_normalized", "q39_dedup_drop_normalized",
    "q32_fingerprint", "q33_json_props", "q34_multimodal",
    "q46_knn_join", "q47_neardup_clusters", "q50_pack_sequences",
    "q51_decontam", "q53_repetition_quality", "q54_pii_scrub",
    "q56_chunk_dedup", "q58_token_rarity", "q59_boilerplate",
    "q61_quantize_int8", "q62_knn_quantized", "q63_dedup_incremental",
    "q64_semantic_dedup", "q65_hashed_score",
    "q95_lm_score", "q96_dsir_weights", "q98_kmeans_step",
    "q125_token_entropy", "q128_source_overlap")

  /** Joins against a broadcast-worthy global/dimension table. */
  private val MustBroadcast = Seq("q02_join_global_inner", "q03_join_global_left")

  /** Violations for one query's formatted physical plan (empty = clean).
    * Exposed so the test suite runs the same gate as `--check`. */
  def violations(name: String, plan: String): Seq[String] = Seq(
    Option.when(plan.contains("CartesianProduct"))(
      "CartesianProduct (unconstrained all-pairs join)"),
    Option.when(MustBroadcast.contains(name) && !plan.contains("BroadcastHashJoin"))(
      "global-table join is not a BroadcastHashJoin"),
    Option.when(CpuHeavy.contains(name) && !plan.contains("RoundRobinPartitioning"))(
      "CPU-heavy query lost its scatter exchange (1-partition scan)"),
    // The r13 regression class, made standing: `max_by`/`max(struct)`
    // silently plan SortAggregate (a per-partition SORT of every group's
    // rows before each partial and final aggregate — at 100 TB that is
    // a corpus sort per aggregation stage). Every aggregate in the
    // registered surface must stay HashAggregate/ObjectHashAggregate
    // (argmax work goes through functions.ArgExtremum). No allowlist on
    // purpose: one new max_by(struct) call is exactly the regression
    // this rule exists to catch.
    Option.when(plan.contains("SortAggregate"))(
      "SortAggregate (hash aggregate fell back to per-group sort)")
  ).flatten

  def main(args: Array[String]): Unit = {
    val check = args.headOption.contains("--check")
    val rest = if (check) args.drop(1) else args
    val sfDir = rest.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def plan(n: String): String =
      SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)

    if (check) {
      val failures = SparkEntry.queries.keys.toSeq.sorted.flatMap { n =>
        val errs = violations(n, plan(n))
        errs.foreach(e => println(s"[plan-check] FAIL $n: $e"))
        if (errs.isEmpty) println(s"[plan-check] pass $n")
        errs.map(n -> _)
      }
      println(s"[plan-check] ${SparkEntry.queries.size - failures.map(_._1).distinct.size} ok, " +
        s"${failures.size} violations")
      spark.stop()
      if (failures.nonEmpty) sys.exit(1)
    } else {
      val names = if (rest.length > 1) rest.drop(1).toSeq
        else Seq("q01_agg_pricing", "q02_join_global_inner", "q10_asof_left",
          "q23_dedup_ngram", "q26_sim_topk", "q16_latest_per_key",
          "q53_repetition_quality", "q56_chunk_dedup", "q58_token_rarity")
      names.foreach { n =>
        println(s"\n========== $n ==========")
        println(plan(n))
      }
      spark.stop()
    }
  }
}
