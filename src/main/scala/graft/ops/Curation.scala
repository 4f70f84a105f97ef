package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative quality-filter funnels with drop attribution.
  *
  * Production curation is a PIPELINE of filters (length, language,
  * repetition, PII, model score, …), and the operational question is
  * never just "what survived" but "which rule dropped what" — the
  * per-rule funnel is how a pipeline change is reviewed before it
  * reprocesses the corpus (C4/Gopher/RefinedWeb all publish exactly
  * this table). Running the rules as N separate filtered passes scans
  * the corpus N times and mis-attributes overlapping drops; this
  * evaluates the whole rule list in ONE narrow projection and charges
  * each document to the FIRST rule it fails — the funnel semantics of
  * a sequential pipeline, in one scan. */
object Curation {

  /** Per-document funnel attribution: `first_failed` = the name of the
    * first rule (in `rules` order) whose predicate is false, null when
    * every rule passes; `kept` = all-pass. One stateless projection —
    * no shuffle, no state; at 100 TB this is a free rider on whatever
    * scan already touches the corpus.
    *
    * Rule predicates must be null-safe (a null predicate result is
    * treated as PASS by Spark's `when` fall-through — wrap with
    * `coalesce(p, lit(false))` for fail-closed semantics where that
    * matters). */
  def filterFunnel(df: DataFrame, idCol: String,
      rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    require(rules.map(_._1).distinct.size == rules.size,
      s"duplicate rule names in ${rules.map(_._1)}")
    df.withColumn("first_failed",
        rules.foldRight(lit(null).cast("string")) {
          case ((name, p), els) => when(!p, lit(name)).otherwise(els)
        })
      .withColumn("kept", col("first_failed").isNull)
  }

  /** The aggregated funnel table: one row per rule (plus the survivors
    * under name null) with its attributed drop count — the review
    * artifact. Tiny output (|rules| + 1 rows) off one hash aggregate
    * over [[filterFunnel]]'s projection. */
  def funnelCounts(df: DataFrame, idCol: String,
      rules: Seq[(String, Column)]): DataFrame =
    filterFunnel(df, idCol, rules)
      .groupBy(col("first_failed")).agg(count(lit(1)).as("n_docs"))
}
