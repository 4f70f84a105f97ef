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
  * All operators follow the filter-and-verify discipline (Gravano et
  * al. VLDB 2001; Xiao et al. Ed-Join VLDB 2008; Chaudhuri et al. ICDE
  * 2006 prefix filtering): a COMPLETE signature join proposes a candidate
  * superset, and an exact per-pair predicate keeps only true matches —
  * so results are exact (oracle-checkable row for row) while the
  * quadratic all-pairs comparison never runs. Signatures are ordered by
  * ascending global frequency (rarest first), the standard choice that
  * minimizes candidate fanout: a gram shared by half the corpus is
  * pushed out of every signature that can afford to drop it.
  *
  * SCALE HONESTY: no exact edit filter survives an adversarial corpus.
  * When strings are near-uniform draws over a tiny alphabet (the
  * synthetic word-soup corpus is exactly this), every pair shares even
  * its rarest grams and the candidate set degrades toward all-pairs —
  * measured here: 40-char soup titles pass ~70% of pairs through the
  * k=6 prefix filter. Production edit joins therefore DEPLOY in one of
  * two scale-sane shapes, both provided: probe-vs-corpus lookup
  * ([[editDistanceLookup]] — candidates bounded by |probe| × corpus
  * collisions) and a blocked self-join ([[editDistanceJoin]] with
  * `blockOn` — candidates bounded per block). The unblocked self-join
  * remains available and exact; its worst case is the data's fault.
  */
object StringSim {

  /** Partition count for a pinned (AQE-exempt) exchange feeding a
    * CPU-dense verify stage: `2 × max(cluster width, configured shuffle
    * width)`. Rationale: AQE's byte-based partition coalescing shrinks a
    * stage to a handful of tasks exactly when its INPUT is few bytes but
    * its work is CPU-heavy (candidate verification: a levenshtein pair
    * or an intersection count costs ~ms per row of input). A
    * REPARTITION_BY_NUM exchange is exempt from coalescing, and this
    * count (a) never narrows below either the cluster or the user's
    * shuffle.partitions intent, (b) never equals the plan-time child
    * partition count, so EnsureRequirements cannot elide the shuffle as
    * already-satisfied (the r20 mistake), and (c) oversplits 2×, which
    * smooths stragglers in compute-bound stages at worst-case half the
    * configured partition byte size. */
  private def verifyWidth(df: DataFrame): Int = {
    val s = df.sparkSession
    2 * math.max(s.sparkContext.defaultParallelism,
      s.conf.getOption("spark.sql.shuffle.partitions")
        .flatMap(v => scala.util.Try(v.toInt).toOption).getOrElse(200))
  }

  /** All `q`-grams of a string as a multiset (duplicates kept — the
    * count filter below is a multiset bound). Empty array for strings
    * shorter than `q`. Kept inline per the [[Dedup.wordShingles]]
    * lesson: one expression, no re-tokenizing filter copies. */
  def charGrams(s: Column, q: Int): Column =
    when(length(s) >= q,
      transform(sequence(lit(1), length(s) - (q - 1)), i => s.substr(i, lit(q))))
      .otherwise(array().cast("array<string>"))

  /** Edit-distance similarity self-join: all unordered pairs `{a, b}`
    * with `levenshtein(a, b) <= maxDist` over `strCol` — restricted to
    * pairs agreeing on every `blockOn` column when blocking keys are
    * given (the production discipline: near-identical titles WITHIN a
    * language/source; cross-block pairs are out of contract).
    *
    * `lengthBand` (0 = off) adds LENGTH-INTERVAL blocking with neighbor
    * probing — the scale knob for growing corpora, where any fixed
    * `blockOn` cardinality eventually makes within-block candidates
    * quadratic: strings are banded by `length div lengthBand`, and the
    * candidate joins run within (block, band) with each string ALSO
    * probing the band above it. Completeness is preserved, not
    * approximated: `ed(a,b) <= k` forces `|len(a) − len(b)| <= k`
    * (every edit moves length by at most 1), so with band width
    * `>= maxDist` (required) a true pair's bands differ by at most 1,
    * and own-band + next-band probing reaches every such pair — at
    * ~2× candidate-key cost. Results are IDENTICAL to the unbanded
    * form; the band only prunes pairs the length filter (step 3 below)
    * would discard anyway. Unlike `blockOn`, the band count GROWS with
    * the corpus's length spread, so candidate blocks stay bounded where
    * fixed keys saturate (measured: the fixed-block probe exponent
    * climbs 0.65 → 0.82 from 10× to 30× while the banded form stays
    * flat — SCALING.md "edit join at scale").
    *
    * Filter chain (each step preserves within-block completeness):
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
    *  4. **Exact verify**: threshold-form `levenshtein` — banded DP,
    *     `O(k·n)` per pair with early exit, not the full `O(n²)`
    *     table; the verify is the hot loop when data defeats the
    *     prefix filter.
    *
    * Strings with at most `k·q` grams (length `< k·q + q`) get no
    * overlap guarantee from step 1 (the bound is vacuous when both
    * sides are that short), so the short stragglers are all-paired
    * among themselves per block — by construction a bounded bucket
    * (strings shorter than ~`k·q` chars); short×long pairs are still
    * covered by the main path because the long side's bound stays
    * positive and `k·q + 1` grams cover the short side's whole
    * multiset.
    *
    * Scale shape: one explode to the gram table (`Σ|s|` rows), a
    * vocab-sized frequency aggregate broadcast back, one doc-keyed
    * exchange for the per-string rank (partitions of `|s|` rows — never
    * a global sort), the (gram, block)-keyed candidate equi-join (the
    * only fanout, bounded by the rare-first prefix discipline and the
    * block sizes), and a pair-keyed verify. No all-pairs product
    * anywhere (except the per-block short bucket by design).
    *
    * `maxBandOccupancy` (banded mode): fail-fast bound on strings per
    * (block, band). Banding prunes, it does not change the exponent —
    * with a FIXED length spread the band count saturates and
    * within-band occupancy grows ∝ corpus, so the self-join trends
    * quadratic again (measured exponent 0.37 @10× → 0.78 @30×). Past
    * the bound the job raises with the routing (the [[graft.ops.Joins]]
    * rangeJoin discipline) instead of silently degrading:
    * [[editDistanceLookup]] for incremental corpora, wider length
    * spread / more `blockOn` keys otherwise. 0 disables.
    *
    * Output: `blockOn` columns, `id_a`, `id_b` (`id_a < id_b`),
    * `dist` (long). */
  def editDistanceJoin(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int, q: Int = 2, blockOn: Seq[String] = Nil,
      lengthBand: Int = 0, maxBandOccupancy: Long = 1L << 16,
      scope: CacheScope = CacheScope.session): DataFrame = {
    require(maxDist >= 1 && maxDist <= 32, s"maxDist in [1, 32], got $maxDist")
    require(q >= 1 && q <= 8, s"q in [1, 8], got $q")
    require(lengthBand == 0 || lengthBand >= maxDist,
      s"lengthBand must be 0 (off) or >= maxDist (a true pair's lengths " +
        s"differ by <= maxDist, so narrower bands would lose pairs); " +
        s"got lengthBand=$lengthBand, maxDist=$maxDist")
    val sigLen = maxDist * q + 1
    val bks = blockOn.map(c => s"__bk_$c")
    val banded = lengthBand > 0
    // join keys shared by the candidate joins: the block columns plus
    // (when banding) the length band; the probing side registers its own
    // band AND the band above (neighbor probing — see scaladoc)
    val candKeys = if (banded) bks :+ "__band" else bks
    def probeBands(c: Column*): Seq[Column] =
      if (banded) c :+ explode(array(col("__band"), col("__band") + 1))
        .as("__band")
      else c
    // the string table feeds the gram build, the short bucket, and both
    // verify joins; the gram table feeds the frequency agg and the rank —
    // cache both or each consumer re-scans + re-explodes the source
    val s = scope.cache(df.select(
        col(idCol).as("__id") +: col(strCol).as("__s") +:
          blockOn.zip(bks).map { case (c, b) => col(c).as(b) }: _*)
      .filter(col("__s").isNotNull)
      .withColumn("__band",
        if (banded) expr(s"CAST(length(__s) AS BIGINT) div $lengthBand")
        else lit(0L)))
    val grams = scope.cache(s.select(
      col("__id") +: col("__band") +: length(col("__s")).as("__len") +:
        bks.map(col) :+
        posexplode(charGrams(col("__s"), q)).as(Seq("__pos", "__g")): _*))
    val freq = grams.groupBy(col("__g")).agg(count(lit(1)).as("__f"))
    val rankW = Window.partitionBy(col("__id"))
      .orderBy(col("__f").asc, col("__g").asc, col("__pos").asc)
    val sig = grams.join(broadcast(freq), "__g")
      .withColumn("__rn", row_number().over(rankW))
      .filter(col("__rn") <= sigLen)
      .select(col("__id") +: col("__g") +: col("__band") +:
        col("__len") +: bks.map(col): _*)
    // Saturation guard (banded mode only — the mode whose contract is
    // "bounded blocks"): banding is a completeness-preserving PRUNE,
    // not an exponent fix, and when the corpus's length spread is fixed
    // the band count saturates while within-(block, band) occupancy
    // grows ∝ corpus — the self-join silently trends quadratic again
    // (measured: exponent 0.37 @10× → 0.78 @30× on the fixed-spread
    // fixture, SCALING.md "edit join at scale"). The rangeJoin
    // discipline applies: fail FAST with the routing, never degrade
    // silently. The check is a (blocks × bands)-sized aggregate over
    // the cached string table; the guard rides the occupancy table's
    // JOIN KEY (the rangeJoin trick — column pruning can't drop it),
    // and the occupancy table broadcasts, so the registered side pays
    // one tiny hash join.
    val sigReg = if (banded && maxBandOccupancy > 0) {
      val boom = raise_error(concat(
        lit("editDistanceJoin: length band "),
        col("__band").cast("string"), lit(" holds "),
        col("__occ").cast("string"),
        lit(s" strings (> maxBandOccupancy = $maxBandOccupancy): the" +
          " within-band self-join is trending quadratic. Route" +
          " incremental corpora through editDistanceLookup (probe ×" +
          " standing reference, linear per batch); for one-shot" +
          " corpora widen the length spread or add blockOn keys;" +
          " raise maxBandOccupancy only with the quadratic budget" +
          " costed."))).cast("long")
      val occ = s.groupBy((bks.map(col) :+ col("__band")): _*)
        .agg(count(lit(1)).as("__occ"))
        .select((bks.map(col) :+
          when(col("__occ") > maxBandOccupancy, boom)
            .otherwise(col("__band")).as("__band")): _*)
      sig.join(broadcast(occ), candKeys)
    } else sig
    // the prober side explodes to (own band, band above); canonicalize
    // ids AFTER matching — filtering prober < registered instead would
    // lose cross-band pairs whose LOWER id sits in the HIGHER band (only
    // the higher-id side's probe reaches those). The length filter
    // (step 3) runs HERE, on an int carried in the signature, so it
    // prunes BEFORE the distinct — on banded data the band already
    // bounds |Δlen| < 2·band, and this tightens it to ≤ maxDist while
    // the candidate set is at its widest
    val candMain = sigReg.select(
        probeBands(col("__id").as("__ida"), col("__g"),
          col("__len").as("__la")) ++ bks.map(col): _*)
      .join(sig.select(col("__id").as("__idb") +: col("__g") +:
          col("__band") +: col("__len").as("__lb") +: bks.map(col): _*),
        "__g" +: candKeys)
      .filter(col("__ida") =!= col("__idb") &&
        abs(col("__la") - col("__lb")) <= maxDist)
      .select(least(col("__ida"), col("__idb")).as("id_a"),
        greatest(col("__ida"), col("__idb")).as("id_b"))
    // both-short stragglers: no count-filter guarantee, all-pair per
    // (block, band)
    val short = s.filter(length(col("__s")) < maxDist * q + q)
    val shortL = short.select(probeBands(col("__id").as("__ida")) ++
      bks.map(col): _*)
    val shortR = short.select(col("__id").as("__idb") +: col("__band") +:
      bks.map(col): _*)
    val candShort =
      (if (candKeys.isEmpty) shortL.crossJoin(shortR.drop("__band"))
       else shortL.join(shortR, candKeys))
        .filter(col("__ida") =!= col("__idb"))
        .select(least(col("__ida"), col("__idb")).as("id_a"),
          greatest(col("__ida"), col("__idb")).as("id_b"))
    // The verify is the CPU hot loop (~0.3 ms/pair measured on 2k-char
    // docs) but its INPUT bytes are just two strings per pair, so AQE's
    // byte-based partition coalescing collapses the verify stage to a
    // handful of tasks exactly when pairs are numerous-but-small
    // (measured: 3 tasks / 6.2 s cpu on q139's shape). The verify
    // executes in the stage fed by the exchange directly below the
    // string-attach joins: the joins broadcast at this shape and
    // Catalyst folds `levenshtein >= 0` into the last join's condition —
    // so a repartition placed ABOVE the verify is useless (the filter
    // pushes through it, and with the pair key already hash-partitioned
    // at shuffle.partitions it is elided as already-satisfied — the r20
    // mistake, caught by the committed plans). Instead, pin an exchange
    // BETWEEN the distinct and the attach joins at [[verifyWidth]]:
    // deterministic key (retry-safe, no sortBeforeRepartition pass),
    // distinct pair keys spread evenly, and the exchange carries only
    // the DEDUPED pair ids — the distinct keeps its map-side partial
    // aggregation below its own exchange.
    val paired = candMain.unionByName(candShort).distinct()
      .repartition(verifyWidth(df), col("id_a"), col("id_b"))
      .join(s.select(col("__id").as("id_a") +: col("__s").as("__sa") +:
        bks.map(col): _*), "id_a")
      .join(s.select(col("__id").as("id_b"), col("__s").as("__sb")), "id_b")
      .filter(abs(length(col("__sa")) - length(col("__sb"))) <= maxDist)
    paired
      // threshold form = banded DP: O(k·n) per pair with early exit
      // (returns −1 above the threshold), not the full O(n²) table
      .withColumn("dist",
        levenshtein(col("__sa"), col("__sb"), maxDist).cast("long"))
      .filter(col("dist") >= 0)
      .select(blockOn.zip(bks).map { case (c, b) => col(b).as(c) } ++
        Seq(col("id_a"), col("id_b"), col("dist")): _*)
  }

  /** Probe-vs-corpus edit-distance lookup: for every probe string, all
    * corpus strings within `maxDist` — fuzzy entity resolution / typo
    * matching at its deployed granularity (a batch of incoming records
    * matched against a standing reference, never reference × reference).
    *
    * Same filter chain as [[editDistanceJoin]]; the global gram order is
    * computed from the CORPUS side and probe grams absent from the
    * corpus rank as frequency 0 (any consistent total order preserves
    * the prefix-intersection guarantee, and an absent gram can only
    * occupy probe prefix slots, never corpus ones). Candidates are
    * bounded by |probe| × per-gram corpus fanout — linear in the corpus
    * for a fixed probe batch, whatever the alphabet does.
    *
    * Output: `id_a` (probe), `id_b` (corpus), `dist` (long); a probe
    * row present in the corpus matches itself at distance 0. */
  def editDistanceLookup(
      probe: DataFrame, probeId: String, probeStr: String,
      corpus: DataFrame, corpusId: String, corpusStr: String,
      maxDist: Int, q: Int = 2,
      scope: CacheScope = CacheScope.session): DataFrame = {
    require(maxDist >= 1 && maxDist <= 32, s"maxDist in [1, 32], got $maxDist")
    require(q >= 1 && q <= 8, s"q in [1, 8], got $q")
    val sigLen = maxDist * q + 1
    val c = scope.cache(corpus
      .select(col(corpusId).as("__cid"), col(corpusStr).as("__cs"))
      .filter(col("__cs").isNotNull))
    val p = scope.cache(probe
      .select(col(probeId).as("__pid"), col(probeStr).as("__ps"))
      .filter(col("__ps").isNotNull))
    val cGrams = scope.cache(c.select(col("__cid"),
      posexplode(charGrams(col("__cs"), q)).as(Seq("__pos", "__g"))))
    val freq = cGrams.groupBy(col("__g")).agg(count(lit(1)).as("__f"))
    val cRankW = Window.partitionBy(col("__cid"))
      .orderBy(col("__f").asc, col("__g").asc, col("__pos").asc)
    val cSig = cGrams.join(broadcast(freq), "__g")
      .withColumn("__rn", row_number().over(cRankW))
      .filter(col("__rn") <= sigLen)
      .select(col("__cid"), col("__g"))
    val pRankW = Window.partitionBy(col("__pid"))
      .orderBy(col("__f").asc, col("__g").asc, col("__pos").asc)
    val pSig = p.select(col("__pid"),
        posexplode(charGrams(col("__ps"), q)).as(Seq("__pos", "__g")))
      .join(broadcast(freq), Seq("__g"), "left")
      .withColumn("__f", coalesce(col("__f"), lit(0L)))
      .withColumn("__rn", row_number().over(pRankW))
      .filter(col("__rn") <= sigLen)
      .select(col("__pid"), col("__g"))
    val candMain = pSig.join(cSig, "__g")
      .select(col("__pid").as("id_a"), col("__cid").as("id_b"))
    val candShort = p.filter(length(col("__ps")) < maxDist * q + q)
      .select(col("__pid").as("id_a"))
      .crossJoin(c.filter(length(col("__cs")) < maxDist * q + q)
        .select(col("__cid").as("id_b")))
    // pin an AQE-exempt REPARTITION_BY_NUM exchange between the
    // pair-distinct and the string-attach joins so the verify stage it
    // feeds cannot be byte-coalesced (see [[editDistanceJoin]] for the
    // full reasoning): a probe batch's candidates are few BYTES however
    // hot the verify, and the un-pinned stage measured ONE task on
    // q136's shape
    val paired = candMain.unionByName(candShort).distinct()
      .repartition(verifyWidth(probe), col("id_a"), col("id_b"))
      .join(p.select(col("__pid").as("id_a"), col("__ps").as("__sa")), "id_a")
      .join(c.select(col("__cid").as("id_b"), col("__cs").as("__sb")), "id_b")
      .filter(abs(length(col("__sa")) - length(col("__sb"))) <= maxDist)
    paired
      .withColumn("dist",
        levenshtein(col("__sa"), col("__sb"), maxDist).cast("long"))
      .filter(col("dist") >= 0)
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
    * Shingles travel as the 60-bit [[graft.functions.ShingleHashesFn]]
    * hashes, not strings — every exchange carries 8-byte longs, and the
    * DuckDB oracle mirrors the identical md5-based hash so the (≈
    * n²/2^61, none in practice) collision behavior is engine-identical.
    *
    * Scale shape: one codegen shingle-hash scan cached and exploded, a
    * vocab-sized frequency aggregate broadcast back, a doc-keyed rank
    * exchange, the hash-keyed candidate join (signature × inverted
    * index), and a pair-restricted intersection count (candidates ×
    * A-shingles joined once more against the index — never the
    * unrestricted shingle-table self-join). Frequency-ascending
    * signatures keep hot shingles out of the probe side; the index side
    * is uncapped by necessity (capping would silently break the
    * containment contract), so a boilerplate shingle shared by most of
    * the corpus is the AQE-skew/salting hazard to watch — same note as
    * BM25's posting join.
    *
    * Output: `id_a` (contained), `id_b` (container), `inter`, `size_a`,
    * `cont_bp` (= `inter·10000 div size_a`, all long). */
  def containmentJoin(df: DataFrame, idCol: String, textCol: String,
      n: Int, tauBp: Int,
      scope: CacheScope = CacheScope.session): DataFrame = {
    require(n >= 1 && n <= 16, s"n in [1, 16], got $n")
    require(tauBp >= 1 && tauBp <= 10000, s"tauBp in [1, 10000], got $tauBp")
    // five consumers (frequency agg, signature rank, index side of the
    // candidate join, both sides of the intersection count) — cache the
    // exploded hash table once or each re-tokenizes the corpus
    val sh = scope.cache(df.select(col(idCol).as("__id"),
        graft.functions.ShingleHashesFn(col(textCol), n).as("__shs"))
      .withColumn("__na", size(col("__shs")))
      .select(col("__id"), col("__na"), explode_outer(col("__shs")).as("__t"))
      .filter(col("__t").isNotNull))
    val freq = sh.groupBy(col("__t")).agg(count(lit(1)).as("__f"))
    // prefix length |A| - ceil(tauBp*|A|/10000) + 1, integer-exact
    val prefLen = expr(s"__na - (($tauBp * CAST(__na AS BIGINT) + 9999) div 10000) + 1")
    val rankW = Window.partitionBy(col("__id"))
      .orderBy(col("__f").asc, col("__t").asc)
    val sig = sh.join(broadcast(freq), "__t")
      .withColumn("__rn", row_number().over(rankW))
      .filter(col("__rn") <= prefLen)
      .select(col("__id").as("id_a"), col("__t"))
    // Pin an AQE-exempt exchange on the DEDUPED pair ids between the
    // candidate distinct and the intersection count. Without it the
    // whole tail of the query — rank window, candidate join, distinct,
    // both intersection joins, the count aggregate — fuses into the ONE
    // stage fed by the rank's doc-keyed exchange (hash(__id) already
    // satisfies every downstream (id_a, id_b) clustering requirement and
    // the index sides broadcast), and AQE coalesces that stage by its
    // INPUT bytes while its work explodes downstream (measured: 3 tasks
    // holding 4-8.6 s of cpu per run, the query's dominant stage). The
    // pinned exchange moves only 16-byte pair rows and re-spreads the
    // intersection work to [[verifyWidth]] tasks.
    val cand = sig
      .join(sh.select(col("__id").as("id_b"), col("__t")), "__t")
      .filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
      .repartition(verifyWidth(df), col("id_a"), col("id_b"))
    val inter = cand
      .join(sh.select(col("__id").as("id_a"), col("__t")), "id_a")
      .join(sh.select(col("__id").as("id_b"), col("__t")), Seq("id_b", "__t"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
    val sizes = sh.select(col("__id"), col("__na")).distinct()
    inter
      .join(sizes.select(col("__id").as("id_a"), col("__na").as("size_a")), "id_a")
      .withColumn("cont_bp",
        expr("CAST((inter * 10000) div size_a AS BIGINT)"))
      .filter(col("inter") * 10000L >= lit(tauBp.toLong) * col("size_a"))
      .select(col("id_a"), col("id_b"), col("inter"),
        col("size_a").cast("long").as("size_a"), col("cont_bp"))
  }
}
