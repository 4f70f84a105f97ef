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

  /** Per-node triangle counts over an undirected graph — the local
    * clustering signal (n_triangles / (deg·(deg−1)/2) is the local
    * clustering coefficient): dense kNN neighborhoods mark redundant
    * near-duplicate regions, triangle-free nodes mark bridges/noise.
    *
    * The scale discipline is DEGREE ORIENTATION (the classic
    * edge-iterator bound): every edge points from its lower-(degree,
    * id) endpoint to the higher, making the out-degree of any vertex
    * O(√m), so the wedge self-join generates O(m^{3/2}) candidates
    * worst-case instead of Σ deg² — the difference between a hub
    * exploding quadratically and bounded per-key work. Each triangle
    * {x, y, z} (rank x < y < z) is found EXACTLY once: as the wedge
    * (y, z) out of x closed by the oriented edge y→z — no /3
    * correction, no distinct.
    *
    * Scale shape: canonicalize + distinct (one edge-keyed exchange),
    * a nodes-sized degree aggregate joined back, the u-keyed wedge
    * self-join (per-key fanout bounded by orientation), and one
    * (v, w)-keyed closure join; per-vertex counts are a final hash
    * aggregate over 3× the triangle list. Deterministic: set algebra
    * only. Input edges may be directed/duplicated — they canonicalize.
    * Output: idCol, n_triangles (0 for nodes in no triangle). */
  def triangleCounts(edges: DataFrame, nodes: DataFrame, idCol: String,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val deg = und.select(col("a").as("v"))
      .unionByName(und.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    val aFirst = col("__da") < col("__db") ||
      (col("__da") === col("__db") && col("a") < col("b"))
    val oriented = und
      .join(deg.select(col("v").as("a"), col("d").as("__da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("__db")), "b")
      .select(when(aFirst, col("a")).otherwise(col("b")).as("u"),
        when(aFirst, col("b")).otherwise(col("a")).as("w"),
        when(aFirst, col("__db")).otherwise(col("__da")).as("__dw"))
    val wedges = oriented
      .select(col("u"), col("w").as("v"), col("__dw").as("__dv"))
      .join(oriented.select(col("u"), col("w"), col("__dw")), "u")
      .filter(col("__dv") < col("__dw") ||
        (col("__dv") === col("__dw") && col("v") < col("w")))
      .select(col("u"), col("v"), col("w"))
    val tris = wedges
      .join(oriented.select(col("u").as("v"), col("w")), Seq("v", "w"))
    val counts = tris
      .select(explode(array(col("u"), col("v"), col("w"))).as("__v"))
      .groupBy(col("__v")).agg(count(lit(1)).as("__t"))
    nodes.select(col(idCol))
      .join(counts.select(col("__v").as(idCol), col("__t")), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("__t"), lit(0L)).as("n_triangles"))
  }
}
