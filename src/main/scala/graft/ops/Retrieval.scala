package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ranked-retrieval operators: score a small query set against the
  * corpus and keep the best k documents per query. The curation use is
  * targeted corpus mining ("find the documents most like these seed
  * examples") and retrieval-based inspection of a 100 TB corpus —
  * the lexical complement to [[Similarity]]'s embedding top-k. The
  * reference has no retrieval surface (SURVEY §2.7); driver-extension
  * family like [[Rank]]. */
object Retrieval {

  /** BM25 top-k retrieval: the k best documents per query under
    * Okapi BM25 with a RATIONAL IDF. Instead of the classic
    * `ln((N - df + 0.5)/(df + 0.5) + 1)` this uses the log's argument
    * `(N - df + 0.5)/(df + 0.5)` directly as the term weight: `ln` is
    * only faithfully rounded and differs per libm (the
    * [[TextAnalysis.tokenRarity]] reasoning), while the rational form
    * is one IEEE-exact division — bit-identical on any engine — and
    * preserves the df ordering (ln is monotone), so which documents
    * score high for WHICH terms is unchanged; only the relative
    * weighting across terms is steeper, and as a bonus the weight is
    * always positive (log-IDF goes negative past df > N/2, a known
    * BM25 wart). Term frequency saturation is standard:
    * `tf·(k1+1)/(tf + k1·(1 - b + b·dl/avgdl))` with query-term
    * multiplicity ignored (qtf = 1, the common implementation choice).
    * Per-term scores are rounded to 6 dp and summed as DECIMAL — the
    * doc score is an exact decimal sum, immune to float addition
    * order, then ranked (score desc, id asc) through the bounded-heap
    * [[Rank.topNPerGroup]].
    *
    * Scale shape (corpus = `docs`, queries small and broadcast
    * throughout): the token explode is cached once and feeds doc
    * lengths, corpus stats, and the posting build; the posting list is
    * cut to the QUERY VOCABULARY by a broadcast semi-join BEFORE its
    * tf aggregate, so everything downstream of the one corpus-keyed
    * doc-length join is sized |docs matching any query term| ×
    * |query vocab| — never corpus × vocab. Document frequencies and
    * corpus stats are query-vocab-sized / 1-row broadcasts. The final
    * per-(query, doc) sum partially aggregates, and the heap keeps k
    * rows of state per query per task. At 100 TB one hot query term is
    * a skewed join key — the same AQE-skew/salting note as
    * [[TextAnalysis.tokenRarity]]'s frequency join. */
  def bm25TopK(docs: DataFrame, idCol: String, text: Column,
      queries: DataFrame, qidCol: String, qtext: Column, k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      scope: CacheScope = CacheScope.session): DataFrame = {
    require(k >= 1, s"k >= 1, got $k")
    require(k1 > 0 && b >= 0 && b <= 1, s"need k1 > 0, b in [0,1]; got ($k1, $b)")
    // doc lengths are a NARROW per-row projection (token count =
    // size of the filtered split), not an explode + corpus-wide
    // groupBy — the length table needs no exchange at all, and the
    // token explode below feeds only the (broadcast-cut) posting
    // build, so it is never materialized corpus-wide either
    // (measured: the explode+groupBy dl build was the query's
    // largest exchange). Empty/whitespace-only/null docs are excluded
    // so corpus size N counts only docs with >= 1 token — the same
    // population an inverted index derives lengths from; a zero-token
    // doc can never score anyway.
    val dl = scope.cache(docs.select(col(idCol),
      size(filter(split(text, " "), t => t =!= "")).cast("long").as("__dl"))
      .filter(col("__dl") >= 1))
    // corpus stats stay an exact integer pair (N, total length); the
    // avgdl division happens inside the per-term expression so both
    // engines evaluate the identical IEEE tree
    val stats = dl.agg(count(lit(1)).as("__n"), sum(col("__dl")).as("__len"))
    val qterms = queries
      .select(col(qidCol), explode(split(qtext, " ")).as("__tok"))
      .filter(length(col("__tok")) > 0).distinct()
    val qvocab = qterms.select(col("__tok")).distinct()
    val posting = scope.cache(
      docs.select(col(idCol), explode(split(text, " ")).as("__tok"))
        .filter(length(col("__tok")) > 0)
        .join(broadcast(qvocab), Seq("__tok"), "left_semi")
        .groupBy(col(idCol), col("__tok"))
        .agg(count(lit(1)).as("__tf")))
    // posting is distinct per (doc, term), so df = plain count; result
    // is query-vocab-sized
    val dfreq = posting.groupBy(col("__tok")).agg(count(lit(1)).as("__df"))
    val n = col("__n").cast("double")
    val idf = (n - col("__df").cast("double") + lit(0.5)) /
      (col("__df").cast("double") + lit(0.5))
    // dl/avgdl as (dl·N)/len: two exact long-to-double casts, one
    // multiply, one divide — no intermediate rounding to disagree on
    val relLen = col("__dl").cast("double") * n / col("__len").cast("double")
    val tfd = col("__tf").cast("double")
    val sat = tfd * lit(k1 + 1.0) /
      (tfd + lit(k1) * (lit(1.0 - b) + lit(b) * relLen))
    val perDoc = posting
      .join(dl, idCol)
      .crossJoin(broadcast(stats))
      .join(broadcast(dfreq), "__tok")
      .join(broadcast(qterms), Seq("__tok"))
      .select(col(qidCol), col(idCol),
        round(idf * sat, 6).cast("decimal(18,6)").as("__term_score"))
      .groupBy(col(qidCol), col(idCol))
      .agg(sum(col("__term_score")).cast("double").as("score"))
    Rank.topNPerGroup(perDoc, Seq(qidCol), idCol, "score", k)
      .select(col(qidCol), col("id").as(idCol), col("score"), col("rank"))
  }

  /** Exact-phrase search over positional postings: documents containing
    * the token sequence `phrase` contiguously, with occurrence counts
    * (overlapping occurrences all count — "a a a" holds TWO "a a"s).
    * The retrieval primitive BM25's bag-of-words scoring cannot
    * express: "foo bar" as a PHRASE, not two terms.
    *
    * Scale shape: ONE token scan filtered to the phrase's terms before
    * anything else (`isin` pushes into the explode — the posting lists
    * are phrase-vocabulary-sized, a vanishing fraction of the corpus),
    * cached once, then `len(phrase) − 1` (doc, position)-keyed
    * equi-joins anchored on the FIRST term, each join key carrying the
    * position offset so only aligned occurrences survive. Join fanout
    * per step is bounded by per-doc term frequency; a stopword inside
    * the phrase makes a fat posting list — the standard mitigation
    * (anchor the chain on the rarest term first) is a join-order
    * choice AQE makes from runtime sizes, and the chain is
    * commutative: every order yields the same aligned positions.
    * Output: `idCol`, `n_occ` (long, ≥ 1). */
  def phraseSearch(docs: DataFrame, idCol: String, text: Column,
      phrase: Seq[String],
      scope: CacheScope = CacheScope.session): DataFrame = {
    require(phrase.nonEmpty && phrase.size <= 16,
      s"phrase of 1..16 tokens, got ${phrase.size}")
    val toks = scope.cache(docs
      .select(col(idCol), posexplode(split(text, " ")).as(Seq("__pos", "__tok")))
      .filter(col("__tok").isin(phrase.distinct: _*)))
    val anchor = toks.filter(col("__tok") === phrase.head)
      .select(col(idCol), col("__pos"))
    val aligned = phrase.zipWithIndex.tail.foldLeft(anchor) {
      case (acc, (w, i)) =>
        acc.join(toks.filter(col("__tok") === w)
            .select(col(idCol), (col("__pos") - i).as("__pos")),
          Seq(idCol, "__pos"))
    }
    aligned.groupBy(col(idCol)).agg(count(lit(1)).as("n_occ"))
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Büttcher, SIGIR'09) of N
    * per-query ranked lists into one hybrid ranking:
    * `rrf(d) = Σ_lists 1/(c + rank_list(d))`, the standard lexical ⊕
    * vector retrieval combiner (the BM25 + ANN "hybrid search" every
    * RAG-era curation pipeline runs). Rank-based fusion needs no score
    * calibration between lists — BM25 scores and cosines never share a
    * scale, ranks always do.
    *
    * Each input must carry (`qidCol`, `idCol`, `rankCol`) with 1-based
    * ranks — i.e. each IS already a bounded top-k list (the output of
    * [[bm25TopK]], [[Similarity.bruteForceTopK]], [[Similarity
    * .ivfTopKFitted]], …). Per-term reciprocals are rounded to 9 dp and
    * summed as DECIMAL(19,9), so the fused score is an exact decimal
    * sum — immune to float addition order across any number of lists
    * (the [[bm25TopK]] trick). Ties broken by ascending id.
    *
    * Scale shape: the union is Σ|list_i| rows — each input is a top-k
    * output, so per query this is ≤ Σk_i rows, NOT corpus-sized; the
    * fuse is one (qid, id) partial-aggregating exchange of that bounded
    * union and the final rank is a window over ≤ Σk_i rows per query.
    * The expensive part of hybrid search is producing the input lists;
    * fusion itself never touches the corpus.
    *
    * Output: `qidCol`, `idCol`, `rrf` (double), `n_lists` (long — how
    * many lists surfaced the doc), `best_rank` (long), `rank` (long,
    * 1-based by rrf desc, id asc), capped at `k` per query. */
  def rrfFuse(ranked: Seq[DataFrame], qidCol: String, idCol: String,
      rankCol: String, k: Int, c: Int = 60): DataFrame = {
    require(ranked.nonEmpty, "need at least one ranked list")
    require(k >= 1, s"k >= 1, got $k")
    require(c >= 0, s"rrf constant c >= 0, got $c")
    val u = ranked.map(_.select(col(qidCol), col(idCol),
      col(rankCol).cast("long").as("__r"))).reduce(_ unionByName _)
    val fused = u
      .withColumn("__term",
        round(lit(1.0) / (lit(c).cast("double") + col("__r").cast("double")), 9)
          .cast("decimal(19,9)"))
      .groupBy(col(qidCol), col(idCol))
      .agg(sum(col("__term")).cast("double").as("rrf"),
        count(lit(1)).as("n_lists"),
        min(col("__r")).as("best_rank"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qidCol)).orderBy(col("rrf").desc, col(idCol).asc)
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
