package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
}
