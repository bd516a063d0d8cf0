package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.text

/** Bigram language-model fluency scoring — the perplexity-filter stage of
  * CCNet (Wenzek et al. 2020 §4.3: score crawled text with an LM trained
  * on a reference corpus; keep the low-perplexity head). The reference
  * repo has no LM stage (its quality gate is rule-based,
  * `/root/reference/silver_check.py`); this is the standard extension a
  * pretraining pipeline needs between the rule filter ([[Filtering]])
  * and the classifier cut ([[Classifier]]).
  *
  * The model is add-one-smoothed over the PRUNED bigram table (the
  * [[Classifier.trainTermStats]] precedent — smoothing mass lives where
  * the scorer can see it):
  *
  *   V        = (distinct successor words in the model) + 1   (OOV bucket)
  *   ctx(w1)  = Σ_w2 bigram_tf(w1, w2)                        (0 if unseen)
  *   p(w2|w1) = (bigram_tf(w1, w2) + 1) / (ctx(w1) + V)
  *
  * Scale contract: training is ONE pair-keyed aggregation (map-side
  * combine collapses repeats before the exchange; `minCount` prunes the
  * long tail — it is the knob that keeps the model broadcast-sized, and
  * bigram vocabularies grow much faster than unigram ones, so size it
  * deliberately at corpus scale). Scoring broadcasts the model twice
  * (pair weights + per-context totals — both vocabulary-scale); the
  * corpus pays one (doc, pair)-keyed exchange and one shrinking doc
  * rollup. Tokenization runs once per side. Model totals are one tiny
  * action over the model frame; nondeterministic inputs follow the
  * standard pin-first multi-action contract ([[Frequency]]).
  *
  * Determinism: [[surprisal]] quantizes every log weight to
  * micro-micro-nats (×10¹²-rounded longs) and sums in decimal, so
  * per-document scores are bit-identical under any partitioning
  * (spec-pinned). [[pooledLikelihood]] is the fully log-free twin:
  * exact integer masses and an exact cross-multiplied decision,
  * hash-comparable against a SQL oracle end to end.
  */
object NgramLm {

  /** Train the bigram table: `(w1, w2, bigram_tf)` over consecutive token
    * pairs of `textCol`, multiplicity counted; documents with fewer than
    * two tokens contribute nothing. `minCount` drops pairs seen fewer
    * times — the vocabulary bound that keeps the model broadcastable.
    */
  def trainBigramStats(
      docs: DataFrame,
      textCol: String,
      minCount: Long = 1L): DataFrame = {
    require(minCount >= 1L, "minCount must be at least 1")
    pairsOf(docs, textCol, Seq.empty)
      .groupBy("w1", "w2")
      .agg(count(lit(1)).as("bigram_tf"))
      .where(col("bigram_tf") >= minCount)
  }

  /** Per-document mean surprisal under the model, in nats:
    *
    *   surprisal(d) = −(1/N) Σ_pairs ln p(w2|w1)
    *                =  (1/N) Σ_pairs [ln(ctx(w1)+V) − ln(bigram_tf+1)]
    *
    * Out-of-model pairs contribute ln(ctx(w1)+V) (tf term is ln 1 = 0);
    * wholly unseen contexts contribute ln V. Low = fluent-under-the-
    * reference. Documents with fewer than two tokens are absent from the
    * output (the [[Classifier.scoreNB]] precedent). Output: (doc_id,
    * n_bigrams, surprisal).
    */
  def surprisal(
      docs: DataFrame,
      model: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val v = successorVocab(model)
    val pairW = model.select(
      col("w1"), col("w2"),
      round(log((col("bigram_tf") + lit(1L)).cast("double")) * lit(1e12))
        .cast("long").as("__qtf"))
    val ctxW = contexts(model).select(
      col("w1"),
      round(log((col("ctx_tf") + lit(v)).cast("double")) * lit(1e12))
        .cast("long").as("__qden"))
    val oovDen = math.round(math.log(v.toDouble) * 1e12)
    docPairTf(docs, idCol, textCol)
      .join(broadcast(pairW), Seq("w1", "w2"), "left")
      .join(broadcast(ctxW), Seq("w1"), "left")
      .groupBy("doc_id")
      .agg(
        sum("tf").as("n_bigrams"),
        sum(col("tf").cast("decimal(38,0)") *
          (coalesce(col("__qden"), lit(oovDen)) - coalesce(col("__qtf"), lit(0L)))
            .cast("decimal(38,0)")).as("__sq"))
      .select(
        col("doc_id"), col("n_bigrams"),
        (col("__sq").cast("double") / lit(1e12) /
          col("n_bigrams").cast("double")).as("surprisal"))
  }

  /** Log-free exact twin of [[surprisal]] (the [[Classifier.oddsMass]]
    * precedent): ARITHMETIC-mean pooled transition likelihood instead of
    * the geometric mean the log-sum takes —
    *
    *   num_mass(d) = Σ_pairs tf · (bigram_tf + 1)     (OOV pairs: tf · 1)
    *   den_mass(d) = Σ_pairs tf · (ctx(w1) + V)       (unseen w1: tf · V)
    *   fluent(d)  ⇔  num_mass · thrDen ≥ den_mass · thrNum
    *
    * i.e. the pooled estimate num/den is at least the rational threshold
    * thrNum/thrDen — every quantity an exact integer, the decision an
    * exact cross-multiplication, hash-comparable against an ANSI oracle.
    * Not the LM score (a mega-count pair can dominate the arithmetic mean
    * where the log tames it), but a real fluency contract with the same
    * inputs, the same smoothing, and the same sign on single-pair
    * documents. Output: (doc_id, num_mass, den_mass, fluent).
    */
  def pooledLikelihood(
      docs: DataFrame,
      model: DataFrame,
      idCol: String,
      textCol: String,
      thrNum: Long,
      thrDen: Long): DataFrame = {
    require(thrDen > 0L && thrNum >= 0L, "threshold must be a nonnegative rational")
    val v = successorVocab(model)
    val pairW = model.select(
      col("w1"), col("w2"), (col("bigram_tf") + lit(1L)).as("__nw"))
    val ctxW = contexts(model).select(
      col("w1"), (col("ctx_tf") + lit(v)).as("__dw"))
    docPairTf(docs, idCol, textCol)
      .join(broadcast(pairW), Seq("w1", "w2"), "left")
      .join(broadcast(ctxW), Seq("w1"), "left")
      .groupBy("doc_id")
      .agg(
        sum(col("tf").cast("decimal(38,0)") *
          coalesce(col("__nw"), lit(1L)).cast("decimal(38,0)")).as("__nm"),
        sum(col("tf").cast("decimal(38,0)") *
          coalesce(col("__dw"), lit(v)).cast("decimal(38,0)")).as("__dm"))
      .select(
        col("doc_id"),
        col("__nm").cast("long").as("num_mass"),
        col("__dm").cast("long").as("den_mass"),
        (col("__nm") * lit(thrDen).cast("decimal(38,0)") >=
          col("__dm") * lit(thrNum).cast("decimal(38,0)")).as("fluent"))
  }

  /** Per-context totals over the pruned model: (w1, ctx_tf). */
  private def contexts(model: DataFrame): DataFrame =
    model.groupBy("w1").agg(sum("bigram_tf").as("ctx_tf"))

  /** V = distinct successors in the pruned model, +1 for the OOV bucket. */
  private def successorVocab(model: DataFrame): Long = {
    val v = model.agg(count_distinct(col("w2")).as("v")).head().getAs[Long]("v") + 1L
    require(v > 1L, "empty model: train on a corpus with at least one bigram")
    v
  }

  /** Consecutive token pairs of `textCol`, one row per pair instance,
    * with any `extra` columns carried. Docs with < 2 tokens vanish.
    */
  private def pairsOf(docs: DataFrame, textCol: String, extra: Seq[String]): DataFrame = {
    val toks = text.tokens(col(textCol))
    docs
      .select((extra.map(col) :+
        explode(when(size(toks) >= 2,
          transform(
            sequence(lit(1), size(toks) - 1),
            i => struct(
              element_at(toks, i).as("w1"),
              element_at(toks, i + 1).as("w2"))))
          .otherwise(array().cast("array<struct<w1:string,w2:string>>")))
          .as("__p")): _*)
      .select((extra.map(col) :+ col("__p.w1") :+ col("__p.w2")): _*)
  }

  /** Per-document pair term frequencies: (doc_id, w1, w2, tf). */
  private def docPairTf(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    pairsOf(docs.select(col(idCol).as("doc_id"), col(textCol)), textCol, Seq("doc_id"))
      .groupBy("doc_id", "w1", "w2")
      .agg(count(lit(1)).as("tf"))
}
