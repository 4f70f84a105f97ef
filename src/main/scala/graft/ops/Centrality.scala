package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph centrality over corpus-derived graphs — the data-selection
  * signal beyond [[Dedup.connectedComponents]]' membership: WHICH
  * members matter (pick central/representative documents from a kNN
  * or citation graph, down-weight orphans).
  *
  * Everything here is FIXED-POINT INTEGER arithmetic: scores carry a
  * 10^12 scale, per-edge contributions are integer floor divisions,
  * damping is a basis-point integer multiply-then-divide. Two engines
  * computing the same iteration agree bit-for-bit — no float sum
  * order, no libm — which is what lets a DuckDB oracle confirm an
  * iterative graph computation exactly. */
object Centrality {

  /** The fixed-point scale: scores start at `Scale` (= 1.0). */
  val Scale: Long = 1000000000000L

  /** Unnormalized damped PageRank, `iters` synchronous rounds:
    *
    * `score'(n) = (Scale · (10⁴ − dampBp)) div 10⁴
    *            + Σ_{e: src→n} (dampBp · (score(src) div outdeg(src))) div 10⁴`
    *
    * (damping applied PER EDGE before the sum — algebraically the same
    * recurrence up to sub-fixed-point truncation, and it keeps every
    * intermediate ≤ dampBp·Scale ≈ 8.5·10¹⁵, so the in-sum stays
    * overflow-safe to ~10⁶× higher in-degree than damping the sum)
    * — the classic random-surfer recurrence with a constant (not
    * 1/N-normalized) teleport mass so the result is a per-node
    * centrality SCORE, not a probability; rank order matches the
    * normalized form. Dangling nodes (no out-edges) leak their mass —
    * the simple variant; a kNN graph has none (every node emits k
    * edges). Deterministic: every step is integer arithmetic
    * (truncating `div`, all quantities non-negative), so iteration
    * order, partitioning, and engine cannot change a single bit.
    *
    * Scale shape per round: one (src-keyed) equi-join of the scores
    * table onto the edge list + one dst-keyed partial-aggregated sum —
    * the [[Dedup.connectedComponents]] cost model (linear in |E| per
    * round, rounds fixed at `iters`, no growth term). The scores table
    * is nodes-sized; `localCheckpoint` between rounds keeps the plan
    * from nesting. Output: idCol, score_fp (fixed-point long;
    * `score_fp / 10^12` is the float score). */
  def pageRankInt(edges: DataFrame, nodes: DataFrame, idCol: String,
      srcCol: String = "src", dstCol: String = "dst",
      iters: Int = 2, dampBp: Int = 8500): DataFrame = {
    require(iters >= 1 && iters <= 20, s"iters in [1, 20], got $iters")
    require(dampBp >= 0 && dampBp <= 10000, s"dampBp in [0, 10000], got $dampBp")
    val spark = edges.sparkSession
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
    val outdeg = e.groupBy(col("__src")).agg(count(lit(1)).as("__deg"))
    val base = Scale * (10000L - dampBp) / 10000L
    var scores = nodes.select(col(idCol), lit(Scale).as("score_fp"))
    (1 to iters).foreach { _ =>
      val contrib = e
        .join(scores.select(col(idCol).as("__src"), col("score_fp")), "__src")
        .join(outdeg, "__src")
        .select(col("__dst"),
          expr(s"($dampBp * (score_fp div __deg)) div 10000").as("__c"))
        .groupBy(col("__dst")).agg(sum(col("__c")).as("__in"))
      scores = scores
        .join(contrib.select(col("__dst").as(idCol), col("__in")),
          Seq(idCol), "left")
        .select(col(idCol),
          (lit(base) + coalesce(col("__in"), lit(0L))).cast("long")
            .as("score_fp"))
        .localCheckpoint(false)
    }
    scores
  }
}
