package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-validation pass (the Deequ/Great-Expectations
  * shape): a rule list checked corpus-wide in ONE aggregation job,
  * returning a long-format constraint report — the gate a training
  * pipeline runs before it trusts a new drop of data. Every metric is
  * an exact integer count, so the report is engine-reproducible
  * bit-for-bit (the house integer-exactness rule; no sampled or
  * approximate checks here — an approximate uniqueness check that
  * waves through a duplicated id column defeats the point). */
object Quality {

  /** A column constraint. `name` keys the report row. */
  sealed trait Rule {
    def name: String
    def column: String
    /** Violation count expression (exact integer). */
    private[ops] def violations: Column
  }

  /** No nulls in `column`. */
  final case class NotNull(column: String) extends Rule {
    val name = s"not_null($column)"
    private[ops] def violations =
      sum(when(col(column).isNull, 1L).otherwise(0L))
  }

  /** All non-null values distinct (exact, not sketched: uniqueness is
    * the constraint a near-duplicate id column fails SILENTLY under
    * HLL error). */
  final case class Unique(column: String) extends Rule {
    val name = s"unique($column)"
    private[ops] def violations =
      count(col(column)) - count_distinct(col(column))
  }

  /** Non-null values inside [lo, hi]. */
  final case class InRange(column: String, lo: Long, hi: Long) extends Rule {
    require(lo <= hi, s"lo <= hi, got ($lo, $hi)")
    val name = s"in_range($column,$lo,$hi)"
    private[ops] def violations =
      sum(when(col(column).isNotNull &&
        (col(column) < lo || col(column) > hi), 1L).otherwise(0L))
  }

  /** Non-null values drawn from `values`. */
  final case class InSet(column: String, values: Seq[String]) extends Rule {
    require(values.nonEmpty, "InSet needs at least one value")
    val name = s"in_set($column)"
    private[ops] def violations =
      sum(when(col(column).isNotNull &&
        !col(column).isin(values: _*), 1L).otherwise(0L))
  }

  /** Check every rule in one aggregation pass. Output (one row per
    * rule, rule-list order preserved via an explicit rank): rank,
    * rule, col_name, n_rows, n_violations, passed.
    *
    * Scale shape: ONE job — all plain-sum metrics partially aggregate
    * in a single scan; each [[Unique]] rule adds a distinct-aggregate
    * expansion (Spark rewrites multi-distinct via Expand: the scan is
    * replayed once per distinct column — the documented cost of exact
    * uniqueness; drop the Unique rules and the pass is one narrow
    * scan). The result is rules-sized; the final melt to long format
    * happens on a 1-row local relation, not the corpus. */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    require(rules.map(_.name).distinct.size == rules.size,
      s"duplicate rule names in ${rules.map(_.name)}")
    val aggs = count(lit(1)).as("__n") +:
      rules.zipWithIndex.map { case (r, i) => r.violations.as(s"__v$i") }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = rules.zipWithIndex.map { case (r, i) =>
      struct(lit(i + 1L).as("rank"), lit(r.name).as("rule"),
        lit(r.column).as("col_name"), col("__n").as("n_rows"),
        coalesce(col(s"__v$i"), lit(0L)).cast("long").as("n_violations"))
    }
    wide.select(explode(array(stacked: _*)).as("__r"))
      .select(col("__r.rank").as("rank"), col("__r.rule").as("rule"),
        col("__r.col_name").as("col_name"), col("__r.n_rows").as("n_rows"),
        col("__r.n_violations").as("n_violations"))
      .withColumn("passed", col("n_violations") === 0L)
  }

  /** Referential-integrity audit — the cross-TABLE constraint [[check]]
    * can't express: does every child foreign key resolve to a parent?
    * Null FKs count separately (an absent reference is a modeling
    * choice, not a dangling one); orphan rate reports in exact integer
    * basis points of the NON-NULL keys. One row out:
    * relation, n_rows, n_null_fk, n_orphans, orphan_bp, passed.
    *
    * Scale shape: the orphan count is a LEFT ANTI equi-join of the
    * child's (pre-aggregated, distinct) FK values against the parent
    * key — the anti-join moves distinct keys, not child rows, and the
    * per-key child multiplicities ride alongside as counts, so a fact
    * table auditing a dimension shuffles dimension-cardinality data.
    * Composable: union several audits into one report. */
  def referentialIntegrity(relation: String, child: DataFrame,
      fkCol: String, parent: DataFrame, pkCol: String): DataFrame = {
    val fkCounts = child.groupBy(col(fkCol).as("__fk"))
      .agg(count(lit(1)).as("__n"))
    val nonNull = fkCounts.filter(col("__fk").isNotNull)
    val orphanN = nonNull
      .join(parent.select(col(pkCol).as("__fk")).distinct(),
        Seq("__fk"), "left_anti")
      .agg(coalesce(sum(col("__n")), lit(0L)).as("n_orphans"))
    val totals = fkCounts.agg(
      sum(col("__n")).as("n_rows"),
      coalesce(sum(when(col("__fk").isNull, col("__n"))), lit(0L))
        .as("n_null_fk"))
    totals.crossJoin(broadcast(orphanN))
      .select(lit(relation).as("relation"), col("n_rows"),
        col("n_null_fk"), col("n_orphans"),
        expr("(n_orphans * 10000) div greatest(n_rows - n_null_fk, 1)")
          .as("orphan_bp"))
      .withColumn("passed", col("n_orphans") === 0L)
  }
}
