package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for large-scale training-data pipelines: tokenization,
  * quality scoring, language id, document fingerprinting. Every function
  * is a pure codegen'd column pipeline (no UDFs) so it runs inside
  * whole-stage codegen and is exactly reproducible in the DuckDB oracle.
  */
object TextOps {

  /** Whitespace tokens (plain single-space split — the corpus invariant;
    * regex-split variants differ across engines on edge cases).
    */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  val StopwordsEn = Seq("the", "a", "of", "and", "to", "is", "in")
  val StopwordsDe = Seq("der", "die", "das", "und", "ist")
  val StopwordsFr = Seq("le", "la", "et", "les", "des")

  private def hits(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isInCollection(words)))

  /** Quality metrics as integer micro-units (ratio * 1e6, rounded). */
  def quality(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val nTok = tokenCount(t).cast("double")
    val noSpace = length(regexp_replace(t, " ", "")).cast("double")
    val stop = hits(t, StopwordsEn).cast("double")
    val punct = (length(t) - length(regexp_replace(t, "[.,;:!?]", ""))).cast("double")
    val upper = (length(t) - length(regexp_replace(t, "[A-Z]", ""))).cast("double")
    // ratio guards: an empty document (or one with no tokens) gets NULL
    // ratios instead of an ANSI DIVIDE_BY_ZERO — Spark 4 runs ANSI by
    // default, so the unguarded division is a crash, not an Infinity
    def ratio(num: Column, den: Column): Column =
      when(den > 0, round(num / den * 1e6, 0).cast("long"))
    df.withColumn("n_chars", length(t).cast("long"))
      .withColumn("n_tokens", tokenCount(t).cast("long"))
      .withColumn("avg_token_len_micro", ratio(noSpace, nTok))
      .withColumn("stopword_ratio_micro", ratio(stop, nTok))
      .withColumn("punct_ratio_micro", ratio(punct, length(t).cast("double")))
      .withColumn("upper_ratio_micro", ratio(upper, length(t).cast("double")))
  }

  /** n-gram-heuristic language id: stopword hit counts per language,
    * argmax with 'en' priority, 'unk' when nothing matches.
    */
  def langId(text: Column): Column = {
    val en = hits(text, StopwordsEn)
    val de = hits(text, StopwordsDe)
    val fr = hits(text, StopwordsFr)
    when(en >= de && en >= fr && en > 0, lit("en"))
      .when(de >= fr && de > 0, lit("de"))
      .when(fr > 0, lit("fr"))
      .otherwise(lit("unk"))
  }

  /** Rolling polynomial hash of the character stream:
    * h = fold(codepoints)(h * 31 + cp) mod 1e9+7. Karp-Rabin-style
    * document fingerprint, exactly reproducible in DuckDB via
    * list_reduce(list_transform(str_split(text,''), ascii), ...).
    * Backed by the native codegen RollingHashExpr — the old
    * aggregate(split(text,"")) HOF fold ran interpreted
    * (CodegenFallback) and allocated one UTF8String per character,
    * dominating the portable minhash/simhash paths.
    */
  def rollingHash(text: Column): Column =
    graft.functions.RollingHash(text)

  /** 3-token shingles of a document (w1 w2 w3 strings), distinct.
    * Documents with fewer than k tokens yield an EMPTY set (matching
    * DuckDB's range(0, len-k) semantics): Spark's sequence(0, negative)
    * would otherwise generate a DESCENDING sequence and slice() at a
    * negative index throws at runtime.
    */
  def shingles(text: Column, k: Int = 3): Column = {
    val toks = tokens(text)
    when(size(toks) >= k,
      array_distinct(
        transform(sequence(lit(0), size(toks) - k),
          i => array_join(slice(toks, i + 1, lit(k)), " "))))
      .otherwise(array().cast("array<string>"))
  }

  /** Jaccard similarity of two shingle-set columns (distinct-set
    * semantics, matching DuckDB list_intersect/list_distinct). Two
    * EMPTY sets score 0.0 — the unguarded 0/0 throws under ANSI; the
    * oracle mirrors never see the case because they filter on a
    * positive intersection first, and a 0.0 here is filtered the same
    * way by every caller's similarity threshold.
    */
  def jaccard(a: Column, b: Column): Column =
    when(size(array_union(a, b)) > 0,
      size(array_intersect(a, b)).cast("double") /
        size(array_union(a, b)).cast("double"))
      .otherwise(lit(0.0))
}
