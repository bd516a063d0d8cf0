package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.text

/** Document-quality rule engine: the Gopher heuristics (Rae et al. 2021
  * §A1.1, public) as named, thresholded rules over the text signals in
  * [[graft.functions.text]].
  *
  * Scale contract: every signal is a self-contained codegen'd expression
  * over the text column — the whole report (and the filter) is ONE scan
  * with zero shuffles, embarrassingly parallel across splits. Per-row
  * cost is a handful of tokenization passes (the same shape the q20/q21
  * family established); nothing leaves whole-stage codegen. The filter
  * form is a plain `where`, so Catalyst pushes surviving predicates and
  * prunes columns exactly as for any other filter.
  */
object Filtering {

  /** Gopher rule thresholds; defaults are the published ones where the
    * paper names a number, conservative stand-ins elsewhere.
    */
  final case class GopherThresholds(
      minTokens: Long = 50L,
      maxTokens: Long = 100000L,
      minMeanTokenLen: Double = 3.0,
      maxMeanTokenLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1,
      maxBulletLineRatio: Double = 0.9,
      maxEllipsisLineRatio: Double = 0.3,
      minAlphaWordRatio: Double = 0.8,
      minStopwordHits: Long = 2L)

  /** The raw signals, as (name, column). */
  def signals(textC: Column): Seq[(String, Column)] = Seq(
    "n_tokens" -> text.tokenCount(textC).cast("long"),
    "mean_token_len" -> text.meanTokenLen(textC),
    "alpha_word_ratio" -> text.alphaWordRatio(textC),
    "symbol_ratio" -> text.symbolRatio(textC),
    "bullet_line_ratio" -> text.bulletLineRatio(textC),
    "ellipsis_line_ratio" -> text.ellipsisLineRatio(textC),
    "stopword_hits" -> text.distinctStopwordHits(textC).cast("long"))

  /** Per-rule pass predicates, resolved through `sig` (the report passes
    * `col` to reference its named signal columns; the filter passes the
    * raw signal expressions) — ONE rule definition, two bindings, so the
    * report and the filter can never drift.
    */
  def rules(th: GopherThresholds, sig: String => Column): Seq[(String, Column)] = Seq(
    "ok_tokens" ->
      (sig("n_tokens") >= th.minTokens && sig("n_tokens") <= th.maxTokens),
    "ok_mean_len" ->
      (sig("mean_token_len") >= th.minMeanTokenLen &&
        sig("mean_token_len") <= th.maxMeanTokenLen),
    "ok_symbols" -> (sig("symbol_ratio") <= th.maxSymbolRatio),
    "ok_bullets" -> (sig("bullet_line_ratio") <= th.maxBulletLineRatio),
    "ok_ellipsis" -> (sig("ellipsis_line_ratio") <= th.maxEllipsisLineRatio),
    "ok_alpha" -> (sig("alpha_word_ratio") >= th.minAlphaWordRatio),
    "ok_stopwords" -> (sig("stopword_hits") >= th.minStopwordHits))

  /** Per-document audit report: id, every signal, every rule verdict, and
    * the conjunction `passes` — what a corpus-curation dashboard reads.
    * One scan, no shuffle.
    */
  def gopherReport(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      th: GopherThresholds = GopherThresholds()): DataFrame = {
    val sigs = signals(col(textCol)).map { case (n, c) => c.as(n) }
    val withSigs = docs.select((col(idCol) +: sigs): _*)
    val named = rules(th, col)
    val ruleCols = named.map { case (n, c) => c.as(n) }
    withSigs
      .select((col("*") +: ruleCols): _*)
      .withColumn("passes", named.map { case (n, _) => col(n) }.reduce(_ && _))
  }

  /** Keep only documents passing every rule — the production path: the
    * whole verdict is one `where` over the source scan (all original
    * columns survive; no report join-back, no second pass).
    */
  def gopherFilter(
      docs: DataFrame,
      textCol: String,
      th: GopherThresholds = GopherThresholds()): DataFrame = {
    val sigMap = signals(col(textCol)).toMap
    docs.where(rules(th, sigMap).map(_._2).reduce(_ && _))
  }
}
