package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.text

/** Reference-vs-crawl document quality scoring — the linear-classifier
  * curation stage of CCNet (Wenzek et al. 2020 §4.4) and the GPT-3 data
  * work (Brown et al. 2020 §A): train cheap per-term class statistics on
  * a labeled seed (reference corpus = positive, raw crawl = negative),
  * then score every crawled document by how reference-like its tokens
  * are. Downstream, the score feeds [[Filtering.topFractionBySource]] /
  * [[Filtering.aboveQuantileBySource]] for the per-domain keep cut.
  *
  * Scale contract: training is ONE term-keyed aggregation over the
  * labeled corpus (map-side combine collapses token instances before the
  * exchange; `minCount` prunes the long tail so the model is
  * vocabulary-scale, MBs). Scoring broadcasts the model: the corpus pays
  * one (doc, term)-keyed exchange (distinct pairs after map-side
  * combine) and one shrinking doc rollup — no corpus-side join shuffle,
  * no second tokenization. Model totals are one tiny action over the
  * model frame; nondeterministic inputs follow the standard pin-first
  * multi-action contract ([[Frequency]]).
  *
  * Determinism: [[scoreNB]]'s log-space weights are QUANTIZED to
  * micro-micro-nats (×10¹²-rounded longs) and summed in decimal — the
  * per-document sum is integer arithmetic, so scores are bit-identical
  * under any partitioning or aggregation order (a raw float sum is not;
  * spec-pinned). [[oddsMass]] is the fully log-free twin: exact integer
  * masses, hash-comparable against a SQL oracle end to end.
  */
object Classifier {

  /** Train per-term class counts: `(term, pos_tf, neg_tf)` over the
    * labeled corpus, token multiplicity counted, rows with a NULL label
    * excluded (an unlabeled doc is neither class). `minCount` drops
    * terms with total count below it — the vocabulary bound that keeps
    * the model broadcastable (and the classic NB noise filter).
    */
  def trainTermStats(
      docs: DataFrame,
      labelCol: String,
      textCol: String,
      minCount: Long = 1L): DataFrame = {
    require(minCount >= 1L, "minCount must be at least 1")
    docs
      .where(col(labelCol).isNotNull)
      .select(
        col(labelCol).cast("boolean").as("__pos"),
        explode(text.tokens(col(textCol))).as("term"))
      .groupBy("term")
      .agg(
        sum(when(col("__pos"), 1L).otherwise(0L)).as("pos_tf"),
        sum(when(!col("__pos"), 1L).otherwise(0L)).as("neg_tf"))
      .where(col("pos_tf") + col("neg_tf") >= minCount)
  }

  /** Model totals: (Σ pos_tf, Σ neg_tf, vocabulary size), defined over
    * the PRUNED model — smoothing mass lives where the scorer can see it.
    */
  private def totals(model: DataFrame): (Long, Long, Long) = {
    val r = model
      .agg(
        coalesce(sum("pos_tf"), lit(0L)).as("p"),
        coalesce(sum("neg_tf"), lit(0L)).as("n"),
        count(lit(1)).as("v"))
      .head()
    (r.getAs[Long]("p"), r.getAs[Long]("n"), r.getAs[Long]("v"))
  }

  /** Add-one-smoothed naive-Bayes log-odds score per document:
    *
    *   score(d) = Σ_t tf_t · [ ln((pos_tf+1)/(Npos+V)) −
    *                           ln((neg_tf+1)/(Nneg+V)) ]
    *
    * positive = reference-like. Out-of-vocabulary tokens get the pure
    * smoothing weight ln((Nneg+V)/(Npos+V)) — algebraically the
    * constant C in `weight(t) = ln((pos_tf+1)/(neg_tf+1)) + C`, which is
    * how the implementation factors it: model terms carry the quantized
    * ln-ratio, every token carries C once, so OOV needs no special row.
    * Documents with zero tokens are absent from the output (the
    * [[Ranking.bm25]] precedent). Output: (doc_id, score), one row per
    * scored doc; ties and order are the caller's concern.
    */
  def scoreNB(
      docs: DataFrame,
      model: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val (nPos, nNeg, v) = totals(model)
    require(v > 0L, "empty model: train on a corpus with at least one term")
    val c = math.log((nNeg + v).toDouble / (nPos + v).toDouble)
    val cq = math.round(c * 1e12)
    val weights = model.select(
      col("term"),
      round(log((col("pos_tf") + lit(1L)).cast("double") /
        (col("neg_tf") + lit(1L)).cast("double")) * lit(1e12)).cast("long").as("__wq"))
    val tf = docs
      .select(col(idCol).as("doc_id"), explode(text.tokens(col(textCol))).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
    tf.join(broadcast(weights), Seq("term"), "left")
      .groupBy("doc_id")
      .agg(
        (sum(col("tf").cast("decimal(38,0)") *
          coalesce(col("__wq"), lit(0L)).cast("decimal(38,0)")) +
          sum(col("tf")).cast("decimal(38,0)") * lit(cq).cast("decimal(38,0)"))
          .as("__sq"))
      .select(col("doc_id"), (col("__sq").cast("double") / lit(1e12)).as("score"))
  }

  /** Log-free exact twin of [[scoreNB]] (the [[Ranking.bm25ExactRational]]
    * precedent): compares ARITHMETIC-mean smoothed likelihood masses
    * instead of the geometric mean the log-sum takes —
    *
    *   pos_mass(d) = Σ_t tf_t · (pos_tf+1)    (OOV terms contribute tf·1)
    *   neg_mass(d) = Σ_t tf_t · (neg_tf+1)
    *   reference_like ⇔ pos_mass · (Nneg+V) > neg_mass · (Npos+V)
    *
    * — every quantity an exact integer, the decision an exact integer
    * cross-multiplication, so the whole dataflow is hash-comparable
    * against an ANSI oracle (q80c). Not NB (a mega-count term can
    * dominate the arithmetic mean where the log tames it), but a real
    * classifier contract with the same inputs, the same smoothing, and
    * the same sign on single-term documents. Output: (doc_id, pos_mass,
    * neg_mass, reference_like); masses are longs (Σ tf·(tf_class+1) —
    * overflow needs a single document × vocabulary product past 9·10¹⁸;
    * the internal sum is decimal, the cast loud on overflow under ANSI).
    */
  def oddsMass(
      docs: DataFrame,
      model: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val (nPos, nNeg, v) = totals(model)
    require(v > 0L, "empty model: train on a corpus with at least one term")
    oddsMassWithTotals(docs, model, idCol, textCol, nPos, nNeg, v)
  }

  /** [[oddsMass]] against CALLER-SUPPLIED model totals — the one-action
    * face [[calibrationReport]] composes on so the totals job runs once
    * and binning can never disagree with the masses about (Npos, Nneg,
    * V) on an unpinned model.
    */
  private def oddsMassWithTotals(
      docs: DataFrame,
      model: DataFrame,
      idCol: String,
      textCol: String,
      nPos: Long,
      nNeg: Long,
      v: Long): DataFrame = {
    val weights = model.select(
      col("term"),
      (col("pos_tf") + lit(1L)).as("__pw"),
      (col("neg_tf") + lit(1L)).as("__nw"))
    val tf = docs
      .select(col(idCol).as("doc_id"), explode(text.tokens(col(textCol))).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
    tf.join(broadcast(weights), Seq("term"), "left")
      .groupBy("doc_id")
      .agg(
        sum(col("tf").cast("decimal(38,0)") *
          coalesce(col("__pw"), lit(1L)).cast("decimal(38,0)")).as("__pm"),
        sum(col("tf").cast("decimal(38,0)") *
          coalesce(col("__nw"), lit(1L)).cast("decimal(38,0)")).as("__nm"))
      .select(
        col("doc_id"),
        col("__pm").cast("long").as("pos_mass"),
        col("__nm").cast("long").as("neg_mass"),
        (col("__pm") * lit(nNeg + v).cast("decimal(38,0)") >
          col("__nm") * lit(nPos + v).cast("decimal(38,0)")).as("reference_like"))
  }

  /** Calibration scorecard for the log-free classifier: docs are binned
    * by the normalized score `p = pmN / (pmN + nmN)` (pmN/nmN the
    * smoothing-normalized masses of [[oddsMass]]) into `bins` equal
    * intervals, and each bin reports how many docs it holds and what
    * fraction actually carry the positive label — the reliability curve
    * that answers "when the classifier says 0.8, is it right 80% of the
    * time", which decides whether a score can gate a corpus cut or only
    * rank it.
    *
    * EXACT binning, no float boundary: bin membership is decided by
    * integer cross-multiplication (`p > j/bins  ⇔  pmN·bins >
    * (pmN+nmN)·j`, summed over j — never a float division whose last
    * ulp could flip a bin between engines). Empty bins are REPORTED
    * with zero counts (the q108 grid discipline). Docs with no tokens
    * have no masses and are excluded — an unscored doc cannot witness
    * calibration — and so are NULL-label docs ([[trainTermStats]]'s own
    * contract: an unlabeled doc is neither class; counting it as a
    * negative would deflate every bin's rate). Output: (bin, n_docs,
    * n_positive, positive_rate, bin_lo, bin_hi), one row per bin.
    *
    * Scale shape: [[oddsMass]]'s cost (model broadcast + one doc-keyed
    * exchange; the model totals job runs ONCE, shared with binning) plus
    * a doc-keyed label join and a `bins`-row rollup.
    */
  def calibrationReport(
      docs: DataFrame,
      model: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, "need at least 2 calibration bins")
    val (nPos, nNeg, v) = totals(model)
    require(v > 0L, "empty model: train on a corpus with at least one term")
    val pmN = col("pos_mass").cast("decimal(38,0)") * lit(nNeg + v)
    val nmN = col("neg_mass").cast("decimal(38,0)") * lit(nPos + v)
    val tot = pmN + nmN
    val binCol = (1 until bins)
      .map(j => when(pmN * lit(bins) > tot * lit(j), lit(1)).otherwise(lit(0)))
      .reduce(_ + _)
    val perBin = oddsMassWithTotals(docs, model, idCol, textCol, nPos, nNeg, v)
      .join(
        docs.select(col(idCol).as("doc_id"), col(labelCol).cast("boolean").as("__lab"))
          .where(col("__lab").isNotNull),
        Seq("doc_id"))
      .select(binCol.cast("int").as("bin"), col("__lab"))
      .groupBy("bin")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("__lab"), 1L).otherwise(0L)).as("n_positive"))
    docs.sparkSession.range(bins).select(col("id").cast("int").as("bin"))
      .join(perBin, Seq("bin"), "left")
      .select(
        col("bin"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_positive"), lit(0L)).as("n_positive"),
        when(coalesce(col("n_docs"), lit(0L)) === 0L, lit(0.0))
          .otherwise(col("n_positive").cast("double") / col("n_docs").cast("double"))
          .as("positive_rate"),
        (col("bin").cast("double") / bins).as("bin_lo"),
        ((col("bin") + 1).cast("double") / bins).as("bin_hi"))
  }
}
