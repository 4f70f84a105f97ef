package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** String-similarity joins with EXACT verification — the near-duplicate
  * operators between byte-exact dedup ([[Dedup.dropExact]]) and the
  * set/vector approximations (MinHash, SimHash, cosine): find all pairs
  * within an edit-distance budget, or all asymmetric set-containments
  * ("doc A's shingles are mostly inside doc B" — the subsumption /
  * quote-detection direction Jaccard is blind to, because a short doc
  * contained in a long one has low Jaccard but 100% containment).
  *
  * Both operators follow the filter-and-verify discipline (Gravano et
  * al. VLDB 2001; Xiao et al. Ed-Join VLDB 2008; Chaudhuri et al. ICDE
  * 2006 prefix filtering): a COMPLETE signature join proposes a candidate
  * superset, and an exact per-pair predicate keeps only true matches —
  * so results are exact (oracle-checkable row for row) while the
  * quadratic all-pairs comparison never runs. Signatures are ordered by
  * ascending global frequency (rarest first), the standard choice that
  * minimizes candidate fanout: a gram shared by half the corpus is
  * pushed out of every signature that can afford to drop it.
  */
object StringSim {

  /** All `q`-grams of a string as a multiset (duplicates kept — the
    * count filter below is a multiset bound). Empty array for strings
    * shorter than `q`. Kept inline per the [[Dedup.wordShingles]]
    * lesson: one expression, no re-tokenizing filter copies. */
  def charGrams(s: Column, q: Int): Column =
    when(length(s) >= q,
      transform(sequence(lit(1), length(s) - (q - 1)), i => s.substr(i, lit(q))))
      .otherwise(array().cast("array<string>"))

  /** Edit-distance similarity self-join: all unordered pairs `{a, b}`
    * with `levenshtein(a, b) <= maxDist` over `strCol`, found without
    * comparing all pairs.
    *
    * Filter chain (each step preserves completeness):
    *  1. **q-gram count filter** (Gravano et al.): one edit operation
    *     destroys at most `q` of a string's `|s|−q+1` q-grams, so
    *     `ed(s,t) <= k` forces a multiset q-gram overlap of at least
    *     `max(|Gs|,|Gt|) − k·q`.
    *  2. **Prefix filter**: order every string's grams by a single
    *     global total order (ascending corpus frequency, then gram,
    *     then position); if the overlap bound holds, the first
    *     `k·q + 1` grams of BOTH strings must share a value — so the
    *     candidate join touches only `k·q + 1` grams per string,
    *     independent of string length.
    *  3. **Length filter**: `| |s| − |t| | <= k` (each edit changes
    *     length by at most 1), applied before the verify.
    *  4. **Exact verify**: `levenshtein` (codegen built-in) on the
    *     surviving candidates.
    *
    * Strings with at most `k·q` grams (length `< k·q + q`) get no
    * overlap guarantee from step 1 (the bound is vacuous when both
    * sides are that short), so the short stragglers are all-paired
    * among themselves — by construction a bounded bucket (strings
    * shorter than ~`k·q` chars); short×long pairs are still covered by
    * the main path because the long side's bound stays positive and
    * `k·q + 1` grams cover the short side's whole multiset.
    *
    * Scale shape: one explode to the gram table (`Σ|s|` rows), a
    * vocab-sized frequency aggregate broadcast back, one doc-keyed
    * exchange for the per-string rank (partitions of `|s|` rows — never
    * a global sort), the gram-keyed candidate equi-join (the only
    * fanout, bounded by the rare-first prefix discipline), and a
    * pair-keyed verify. No all-pairs product anywhere.
    *
    * Output: `id_a`, `id_b` (`id_a < id_b`), `dist` (long). */
  def editDistanceJoin(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int, q: Int = 2): DataFrame = {
    require(maxDist >= 1 && maxDist <= 32, s"maxDist in [1, 32], got $maxDist")
    require(q >= 1 && q <= 8, s"q in [1, 8], got $q")
    val sigLen = maxDist * q + 1
    val s = df.select(col(idCol).as("__id"), col(strCol).as("__s"))
      .filter(col("__s").isNotNull)
    val grams = s.select(col("__id"),
      posexplode(charGrams(col("__s"), q)).as(Seq("__pos", "__g")))
    val freq = grams.groupBy(col("__g")).agg(count(lit(1)).as("__f"))
    val rankW = Window.partitionBy(col("__id"))
      .orderBy(col("__f").asc, col("__g").asc, col("__pos").asc)
    val sig = grams.join(broadcast(freq), "__g")
      .withColumn("__rn", row_number().over(rankW))
      .filter(col("__rn") <= sigLen)
      .select(col("__id"), col("__g"))
    val candMain = sig.join(sig.select(col("__id").as("__idb"), col("__g")), "__g")
      .filter(col("__id") < col("__idb"))
      .select(col("__id").as("id_a"), col("__idb").as("id_b"))
    // both-short stragglers: no count-filter guarantee, all-pair them
    val short = s.filter(length(col("__s")) < maxDist * q + q)
      .select(col("__id"))
    val candShort = short.crossJoin(short.select(col("__id").as("__idb")))
      .filter(col("__id") < col("__idb"))
      .select(col("__id").as("id_a"), col("__idb").as("id_b"))
    candMain.unionByName(candShort).distinct()
      .join(s.select(col("__id").as("id_a"), col("__s").as("__sa")), "id_a")
      .join(s.select(col("__id").as("id_b"), col("__s").as("__sb")), "id_b")
      .filter(abs(length(col("__sa")) - length(col("__sb"))) <= maxDist)
      .withColumn("dist", levenshtein(col("__sa"), col("__sb")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** Shingle-containment self-join: all ORDERED pairs `(a, b)` where at
    * least `tauBp/10000` of `a`'s distinct word `n`-gram shingles also
    * appear in `b` — i.e. `b` (nearly) contains `a`. Asymmetric by
    * design: the containment of a 50-shingle doc inside a 5000-shingle
    * doc is invisible to Jaccard (≈ 1%) but is exactly the
    * quote/subsumption signal a curation pipeline wants.
    *
    * Prefix filter, containment form: a pair qualifies iff
    * `|A ∩ B| >= ceil(tauBp·|A| / 10000) =: τ(A)`; if so, at least one
    * of the first `|A| − τ(A) + 1` shingles of A (in ascending global
    * frequency order) is in B — otherwise at most `τ(A) − 1` of A's
    * remaining shingles could be. So only the CONTAINED side is pruned
    * to its signature; the container side is the full inverted index
    * (it cannot be pruned — any of B's shingles may be the witness).
    * The exact intersection is then counted per candidate pair and the
    * threshold applied as integer arithmetic (no float ratios).
    *
    * Scale shape: one explode to the shingle table, a vocab-sized
    * frequency aggregate broadcast back, a doc-keyed rank exchange, the
    * shingle-keyed candidate join (signature × inverted index), and a
    * pair-restricted intersection count (candidates × A-shingles joined
    * once more against the index — never the unrestricted
    * shingle-table self-join). Frequency-ascending signatures keep hot
    * shingles out of the probe side.
    *
    * Output: `id_a` (contained), `id_b` (container), `inter`, `size_a`,
    * `cont_bp` (= `inter·10000 div size_a`, all long). */
  def containmentJoin(df: DataFrame, idCol: String, textCol: String,
      n: Int, tauBp: Int): DataFrame = {
    require(n >= 1 && n <= 16, s"n in [1, 16], got $n")
    require(tauBp >= 1 && tauBp <= 10000, s"tauBp in [1, 10000], got $tauBp")
    val base = df.select(col(idCol).as("__id"),
        Dedup.wordShingles(col(textCol), n).as("__sh"))
      .select(col("__id"), col("__sh"), size(col("__sh")).as("__na"))
      .filter(col("__na") >= 1)
    val sh = base.select(col("__id"), col("__na"), explode(col("__sh")).as("__t"))
    val freq = sh.groupBy(col("__t")).agg(count(lit(1)).as("__f"))
    // prefix length |A| - ceil(tauBp*|A|/10000) + 1, integer-exact
    val prefLen = expr(s"__na - (($tauBp * CAST(__na AS BIGINT) + 9999) div 10000) + 1")
    val rankW = Window.partitionBy(col("__id"))
      .orderBy(col("__f").asc, col("__t").asc)
    val sig = sh.join(broadcast(freq), "__t")
      .withColumn("__rn", row_number().over(rankW))
      .filter(col("__rn") <= prefLen)
      .select(col("__id").as("id_a"), col("__t"))
    val cand = sig
      .join(sh.select(col("__id").as("id_b"), col("__t")), "__t")
      .filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    val inter = cand
      .join(sh.select(col("__id").as("id_a"), col("__t")), "id_a")
      .join(sh.select(col("__id").as("id_b"), col("__t")), Seq("id_b", "__t"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
    inter
      .join(base.select(col("__id").as("id_a"), col("__na").as("size_a")), "id_a")
      .withColumn("cont_bp",
        expr("CAST((inter * 10000) div size_a AS BIGINT)"))
      .filter(col("inter") * 10000L >= lit(tauBp.toLong) * col("size_a"))
      .select(col("id_a"), col("id_b"), col("inter"),
        col("size_a").cast("long").as("size_a"), col("cont_bp"))
  }
}
