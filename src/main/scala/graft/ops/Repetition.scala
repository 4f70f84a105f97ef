package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Repetition-based quality signals for pretraining corpora — the
  * Gopher-style filters (Rae et al. 2021 §A1.1; also C4's heuristics):
  * documents dominated by repeated fragments (boilerplate, scraper junk,
  * keyword stuffing) are low-quality regardless of their length/stopword
  * stats, and the standard detectors are the *duplicate-token fraction*
  * and the *most-frequent-n-gram character fraction*.
  *
  * Scale shape (100 TB lens): the token-level signal is a pure per-row
  * projection (no shuffle); the n-gram signal explodes each document's
  * word bigrams once and runs two hash aggregates keyed by doc_id — both
  * partial-aggregate before the shuffle, group size is bounded by
  * document length (never corpus size), and no sort/window is involved
  * (the per-doc argmax is a single `max(struct(cnt, gram))`, tie-broken
  * to the lexicographically LARGEST gram by struct ordering — the
  * documented, oracle-mirrored convention).
  *
  * All outputs are exact integers or 6-dp-rounded ratios so a DuckDB
  * oracle reproduces them bit-for-bit (same discipline as
  * [[TextAnalysis.qualityStats]]).
  */
object Repetition {

  /** Fraction of whitespace tokens that are repeats of an earlier token:
    * `1 - distinct_tokens / tokens`, rounded to 6 dp. Codegen-friendly
    * (split / array_distinct / size — no lambda HOFs). */
  def dupTokenFrac(text: Column): Column = {
    val ws = split(text, " ")
    round(lit(1.0) - size(array_distinct(ws)).cast("double") / size(ws), 6)
  }

  /** Word-bigram array without lambda HOFs: zip the token array against
    * itself shifted by one (two codegen `slice`s + `arrays_zip`), then
    * rows explode downstream. Empty when the document has fewer than two
    * tokens. */
  private def bigramZip(text: Column): Column = {
    val ws = split(text, " ")
    arrays_zip(slice(ws, lit(1), size(ws) - 1), slice(ws, lit(2), size(ws) - 1))
  }

  /** Per-document repetition profile over word bigrams:
    * `(doc_id, dup_token_frac, top_bigram, top_bigram_cnt,
    * top_bigram_char_frac)` where `top_bigram_char_frac` is the fraction
    * of the document's characters covered by occurrences of its most
    * frequent bigram (count × bigram length / n_chars, 6 dp) — the
    * Gopher "top-2-gram character fraction" filter signal.
    *
    * Documents with fewer than two tokens have no bigram and are absent
    * from the result (explode drops them); `charsCol` is the document
    * length column (carried through the aggregates as a
    * doc_id-functionally-dependent grouping key — no join-back). */
  def bigramProfile(docs: DataFrame, idCol: String, textCol: String,
      charsCol: String): DataFrame = {
    val base = docs.select(
      col(idCol), col(charsCol),
      dupTokenFrac(col(textCol)).as("dup_token_frac"),
      explode(bigramZip(col(textCol))).as("bg"))
    val grams = base.select(
      col(idCol), col(charsCol), col("dup_token_frac"),
      concat(col("bg.0"), lit(" "), col("bg.1")).as("bigram"))
    // Argmax via a FIXED-WIDTH SORTABLE PACKING, not max(struct(cnt,
    // bigram)): `lpad(cnt, 10) || bigram` compares byte-wise exactly
    // like (cnt, bigram) — count first (zero-padded decimal orders
    // numerically up to 10^10−1 occurrences, unreachable for any real
    // document), then the raw bigram bytes (UTF-8 byte order on both
    // engines — Catalyst's StringType ordering IS unsigned UTF-8
    // memcmp). The max itself is the hash-aggregable
    // [[graft.functions.ArgExtremum]] (ObjectHashAggregate), not
    // Catalyst `max`: a var-length aggregation buffer kicks native max
    // out of HashAggregateExec into SortAggregate, and a partition-wide
    // sort of the distinct-bigram set is exactly the plan a 100 TB
    // corpus can't afford.
    val packed = concat(lpad(col("count").cast("string"), 10, "0"), col("bigram"))
    grams
      .groupBy(idCol, charsCol, "dup_token_frac", "bigram").count()
      .groupBy(idCol, charsCol, "dup_token_frac")
      .agg(graft.functions.ArgExtremum.maxBy(packed, packed).as("m"))
      .select(
        col(idCol), col(charsCol), col("dup_token_frac"),
        col("m").substr(lit(11), length(col("m")) - 10).as("top_bigram"),
        substring(col("m"), 1, 10).cast("long").as("top_bigram_cnt"))
      .select(
        col(idCol), col("dup_token_frac"), col("top_bigram"),
        col("top_bigram_cnt"),
        round(col("top_bigram_cnt") * length(col("top_bigram")) /
          col(charsCol).cast("double"), 6).as("top_bigram_char_frac"))
  }
}
