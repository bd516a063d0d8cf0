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

  // --- Per-source quantile cuts ("keep the best X% of each domain") ---

  /** EXACT per-source top cut: keep each source's `floor(fraction · n)`
    * highest-scoring rows (score descending, ties broken by `idCol`
    * ascending — fully deterministic). This is the per-domain
    * classifier-score cut pretraining pipelines apply after scoring
    * (keep the top 10% of web, top 50% of forums, …). A source smaller
    * than `1/fraction` rows keeps NOTHING (floor semantics — the quota
    * is a fraction, not "at least one"); null sources form one real
    * group and are cut like any other.
    *
    * Scale contract: one exchange on source; count and row_number share
    * the single window sort. The per-source SORT is the scale limit — a
    * dominant source serializes through one task — so at 100 TB prefer
    * [[aboveQuantileBySource]] (sketch threshold, no global sort) and
    * reserve this form for oracle checks and modest strata.
    */
  def topFractionBySource(
      docs: DataFrame,
      sourceCol: String,
      idCol: String,
      scoreCol: String,
      fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction=$fraction outside [0,1]")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(sourceCol))
    val byScore = w.orderBy(col(scoreCol).desc, col(idCol).asc)
    val quota = floor(lit(fraction) * count(lit(1)).over(w).cast("double")).cast("long")
    docs
      .withColumn("__rn", row_number().over(byScore).cast("long"))
      .withColumn("__quota", quota)
      .where(col("__rn") <= col("__quota"))
      .drop("__rn", "__quota")
  }

  /** CCNet-style head/middle/tail bucketing per source: rank rows by
    * `scoreCol` (desc, `idCol` tiebreak) within each source and label the
    * top ⌊h·n⌋ rows `head`, the next ⌊m·n⌋ `middle`, the rest `tail` —
    * the partition a perplexity-filtered pretraining mix trains on
    * (head/middle kept or upsampled, tail dropped). Exact quota
    * semantics: each quota is its own floor (never a floor of a summed
    * float — ⌊0.3n⌋+⌊0.4n⌋, not ⌊0.7n⌋, so the boundary is reproducible
    * across engines), null sources form one real group.
    *
    * Scale contract: one exchange on source; the count and the
    * row_number share the single window sort. Like
    * [[topFractionBySource]], the per-source SORT is the scale limit —
    * at 100 TB use [[scoreBucketsBySourceSketch]] (sketch thresholds, no
    * sort) and keep this form for oracle checks and modest strata.
    */
  def scoreBucketsBySource(
      docs: DataFrame,
      sourceCol: String,
      idCol: String,
      scoreCol: String,
      headFraction: Double,
      middleFraction: Double): DataFrame = {
    require(headFraction >= 0.0 && middleFraction >= 0.0 &&
      headFraction + middleFraction <= 1.0 + 1e-9,
      s"fractions ($headFraction, $middleFraction) must be nonnegative and sum ≤ 1")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(sourceCol))
    val byScore = w.orderBy(col(scoreCol).desc, col(idCol).asc)
    val n = count(lit(1)).over(w).cast("double")
    val hq = floor(lit(headFraction) * n).cast("long")
    val mq = floor(lit(middleFraction) * n).cast("long")
    docs
      .withColumn("__rn", row_number().over(byScore).cast("long"))
      .withColumn("bucket",
        when(col("__rn") <= hq, lit("head"))
          .when(col("__rn") <= hq + mq, lit("middle"))
          .otherwise(lit("tail")))
      .drop("__rn")
  }

  /** SCALE form of [[scoreBucketsBySource]]: per-source GK-sketch score
    * thresholds at the (1−h) and (1−h−m) quantiles broadcast back; the
    * labeling is a pure map — no per-source sort, a dominant source
    * costs what any scan costs. Score-cut semantics (threshold ties all
    * land in the higher bucket) with the sketch's ±relErr·n rank
    * tolerance; pinned against the exact form by FilteringSpec.
    */
  def scoreBucketsBySourceSketch(
      docs: DataFrame,
      sourceCol: String,
      scoreCol: String,
      headFraction: Double,
      middleFraction: Double,
      relErr: Double = 0.01): DataFrame = {
    require(headFraction > 0.0 && middleFraction > 0.0 &&
      headFraction + middleFraction < 1.0,
      s"sketch form needs interior quantiles: fractions ($headFraction, $middleFraction)")
    val qh = 1.0 - headFraction
    val qm = 1.0 - headFraction - middleFraction
    val thresholds = docs
      .groupBy(col(sourceCol).as("__src"))
      .agg(Profile.gkSketchCol(col(scoreCol).cast("double"), relErr).as("__gk"))
      .select(col("__src"), Profile.gkQuantiles(col("__gk"), Seq(qh, qm)).as("__thrs"))
      .select(
        col("__src"),
        col("__thrs").getItem(0).as("__thr_h"),
        col("__thrs").getItem(1).as("__thr_m"))
    docs
      .join(broadcast(thresholds), col(sourceCol) <=> col("__src"))
      .withColumn("bucket",
        when(col(scoreCol).cast("double") >= col("__thr_h"), lit("head"))
          .when(col(scoreCol).cast("double") >= col("__thr_m"), lit("middle"))
          .otherwise(lit("tail")))
      .drop("__src", "__thr_h", "__thr_m")
  }

  /** SCALE form of the per-source cut: keep rows whose score is at or
    * above the source's (1 − fraction) quantile, estimated by the
    * mergeable GK sketch ([[Profile.gkSketchCol]], relErr rank error).
    * The sketch pass is one map-side-combined aggregation at source
    * cardinality; thresholds broadcast back (null-safe, like
    * [[Anomaly.robustOutliers]]) and the cut is a plain `where` — no
    * per-source sort anywhere, so a single dominant source costs what
    * any scan costs.
    *
    * Contract vs the exact form: this is a SCORE cut, not a quota cut —
    * the threshold row itself and every tie at the threshold are kept,
    * and the sketch's rank tolerance adds ±relErr·n; per source the kept
    * count lands in `quota − relErr·n … quota + 1 + ties + relErr·n`.
    * Pinned against [[topFractionBySource]] by FilteringSpec.
    */

  def aboveQuantileBySource(
      docs: DataFrame,
      sourceCol: String,
      scoreCol: String,
      fraction: Double,
      relErr: Double = 0.01): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction=$fraction outside [0,1]")
    if (fraction == 0.0) return docs.where(lit(false))
    val thresholds = docs
      .groupBy(col(sourceCol).as("__src"))
      .agg(Profile.gkSketchCol(col(scoreCol).cast("double"), relErr).as("__gk"))
      .select(
        col("__src"),
        Profile.gkQuantiles(col("__gk"), Seq(1.0 - fraction)).getItem(0).as("__thr"))
    docs
      .join(broadcast(thresholds), col(sourceCol) <=> col("__src"))
      .where(col(scoreCol).cast("double") >= col("__thr"))
      .drop("__src", "__thr")
  }

  /** Attrition funnel over an ORDERED rule chain: for each rule, how many
    * documents entered that stage, how many were dropped THERE (i.e. it
    * was the first rule they failed), and how many survived it — the
    * "where did my corpus go" report every curation run should publish
    * next to its output. Rules short-circuit in the given order, matching
    * how a sequential filter chain would bleed documents; a NULL verdict
    * counts as a failure (a rule that could not evaluate must not pass a
    * document).
    *
    * Scale contract: ONE pass — the first-failed-stage index is a
    * codegen'd conditional, and the whole funnel reduces through a single
    * global aggregation (one partial row per task, rules+1 counters
    * wide); the n-rule funnel arithmetic then unfolds from that one row.
    * No per-stage scans, no window, nothing corpus-sized past the agg.
    */
  def attritionFunnel(report: DataFrame, ruleCols: Seq[String]): DataFrame = {
    require(ruleCols.nonEmpty, "attritionFunnel needs at least one rule column")
    val firstFail = ruleCols.zipWithIndex.foldRight(lit(ruleCols.length)) {
      case ((c, i), rest) => when(!coalesce(col(c), lit(false)), lit(i)).otherwise(rest)
    }
    val aggs = ruleCols.indices.map(i =>
      sum(when(col("__stage") === i, 1L).otherwise(0L)).as(s"__d$i"))
    val counts = report.select(firstFail.as("__stage"))
      .agg(count(lit(1)).as("__total"), aggs: _*)
    val stages = ruleCols.zipWithIndex.map { case (r, i) =>
      val entered = (0 until i)
        .map(j => col(s"__d$j"))
        .foldLeft(col("__total").cast("long"))(_ - _)
      struct(
        lit(i).as("stage"), lit(r).as("rule"),
        entered.cast("long").as("entered"),
        col(s"__d$i").cast("long").as("dropped"),
        (entered - col(s"__d$i")).cast("long").as("surviving"))
    }
    counts.select(explode(array(stages: _*)).as("s")).select("s.*")
  }
}
