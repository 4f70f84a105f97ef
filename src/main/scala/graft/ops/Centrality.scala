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
      iters: Int = 2, dampBp: Int = 8500,
      scope: CacheScope = CacheScope.session): DataFrame = {
    require(iters >= 1 && iters <= 20, s"iters in [1, 20], got $iters")
    require(dampBp >= 0 && dampBp <= 10000, s"dampBp in [0, 10000], got $dampBp")
    val spark = edges.sparkSession
    // every round joins the edge list and the out-degrees: cache both
    // once or each round re-runs the (possibly expensive) edge build —
    // measured 2x on the kNN-edge fixture
    val e = scope.cache(
      edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst")))
    val outdeg = scope.cache(
      e.groupBy(col("__src")).agg(count(lit(1)).as("__deg")))
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
      srcCol: String = "src", dstCol: String = "dst",
      scope: CacheScope = CacheScope.session): DataFrame = {
    // und feeds the degree agg + the orientation; oriented feeds both
    // wedge-join sides + the closure join — cache both or the edge
    // build re-runs up to 6x (measured 4x wall-clock on the kNN-edge
    // fixture, where the build dominates)
    val und = scope.cache(edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct())
    val deg = und.select(col("a").as("v"))
      .unionByName(und.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    val aFirst = col("__da") < col("__db") ||
      (col("__da") === col("__db") && col("a") < col("b"))
    val oriented = scope.cache(und
      .join(deg.select(col("v").as("a"), col("d").as("__da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("__db")), "b")
      .select(when(aFirst, col("a")).otherwise(col("b")).as("u"),
        when(aFirst, col("b")).otherwise(col("a")).as("w"),
        when(aFirst, col("__db")).otherwise(col("__da")).as("__dw")))
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

  /** The `k`-core of an undirected graph — the maximal subgraph where
    * every node keeps degree ≥ k — by iterative peeling (Matula &
    * Beck 1983): drop all nodes of degree < k, recompute degrees,
    * repeat to fixpoint. The density signal above triangles: a node's
    * k-core membership certifies k mutually-supported neighbors even
    * when triangles are absent, and the ≥k-core of a kNN graph marks
    * the redundant near-duplicate regions worth down-sampling hardest.
    *
    * Scale shape per round: one nodes-sized degree aggregate + one
    * (v-keyed, then w-keyed) semi-join restricting the adjacency list —
    * linear in the surviving |E|, and the edge set only shrinks, so
    * total work is rounds × first-round cost at worst (the
    * [[graft.ops.Dedup.connectedComponents]] cost model). Rounds are
    * data-bounded: each non-final round removes ≥1 node, and peeling on
    * bounded-degree graphs (a kNN graph has out-degree k by
    * construction) converges in a handful of rounds; `maxRounds` is the
    * loud fail-fast, NOT a silent truncation — an unconverged loop
    * throws rather than returning a superset of the core. Each round
    * materializes via `localCheckpoint` (the convergence check needs a
    * count anyway) so plans don't nest.
    *
    * Deterministic: set algebra only. Input edges may be directed /
    * duplicated — they canonicalize. Output: `idCol`, `core_deg`
    * (the node's degree within the k-core; ≥ k by definition). */
  def kCore(edges: DataFrame, idCol: String, k: Int,
      srcCol: String = "src", dstCol: String = "dst",
      maxRounds: Int = 12): DataFrame = {
    require(k >= 1 && k <= 1000, s"k in [1, 1000], got $k")
    require(maxRounds >= 1 && maxRounds <= 50, s"maxRounds in [1, 50], got $maxRounds")
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    var adj = und.select(col("a").as("__v"), col("b").as("__w"))
      .unionByName(und.select(col("b").as("__v"), col("a").as("__w")))
      .localCheckpoint(false)
    var edgeCount = adj.count()
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val keep = adj.groupBy(col("__v")).agg(count(lit(1)).as("__d"))
        .filter(col("__d") >= k).select(col("__v"))
      val pruned = adj.join(keep, "__v")
        .join(keep.select(col("__v").as("__w")), "__w")
        .localCheckpoint(false)
      val n = pruned.count()
      converged = n == edgeCount
      adj = pruned
      edgeCount = n
      round += 1
    }
    require(converged,
      s"kCore did not converge within $maxRounds rounds (edges=$edgeCount)")
    adj.groupBy(col("__v")).agg(count(lit(1)).as("core_deg"))
      .select(col("__v").as(idCol), col("core_deg"))
  }
}
