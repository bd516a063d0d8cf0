package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Preference-pair construction for DPO/RLHF-style post-training: turn
  * per-prompt scored responses (rater scores, reward-model outputs,
  * win counts) into (chosen, rejected) training pairs with explicit,
  * engine-reproducible tie-breaks.
  *
  * NULL-scored responses are quarantined (excluded from ranking, still
  * counted in `n_responses`) — a response without a score cannot
  * express a preference, and letting it rank would make the pair
  * depend on engine NULL-ordering conventions.
  *
  * Scale shape: [[pairsByScore]] is ONE hash aggregation keyed by the
  * prompt (map-side combinable `min_by`/`max_by` — no window, no
  * self-join); [[topBottomPairs]] is one exchange by prompt feeding
  * two windowed ranks plus a candidate join whose sides are capped at
  * `p` rows per prompt, so the pairwise expansion is ≤ p² per prompt
  * by construction — never the quadratic all-pairs blowup.
  */
object Preferences {

  /** Per-prompt best-vs-worst pair: chosen = highest score (ties →
    * LOWEST response id), rejected = lowest score (ties → lowest id),
    * emitted only when the prompt has ≥ 2 scored responses and a
    * strictly positive margin (a zero-margin pair carries no
    * preference signal). Output: `prompt, chosen_id, rejected_id,
    * chosen_score, rejected_score, margin, n_responses`.
    */
  def pairsByScore(
      responses: DataFrame,
      promptCol: String,
      idCol: String,
      scoreCol: String): DataFrame = {
    val id = col(idCol)
    val score = col(scoreCol)
    val scored = when(score.isNotNull, lit(1)) // quarantine marker
    responses
      .groupBy(col(promptCol))
      .agg(
        count(lit(1)).as("n_responses"),
        count(scored).as("__n_scored"),
        max_by(id, when(score.isNotNull, struct(score, (id * -1).as("__t"))))
          .as("chosen_id"),
        min_by(id, when(score.isNotNull, struct(score, id.as("__t"))))
          .as("rejected_id"),
        max(score).as("chosen_score"),
        min(score).as("rejected_score"))
      .where(col("__n_scored") >= 2 && col("chosen_score") > col("rejected_score"))
      .select(
        col(promptCol),
        col("chosen_id"),
        col("rejected_id"),
        col("chosen_score"),
        col("rejected_score"),
        (col("chosen_score") - col("rejected_score")).as("margin"),
        col("n_responses"))
  }

  /** Bounded pairwise expansion: every (top-`p`, bottom-`p`) response
    * pair per prompt with a strictly positive margin — the listwise →
    * pairwise step that keeps more signal than best-vs-worst while
    * staying ≤ p² pairs per prompt (all-pairs is quadratic in the
    * response count and dies on heavily-sampled prompts). Ranks use
    * the same total order as [[pairsByScore]]: score, then response
    * id ascending on both sides. Output: `prompt, chosen_id,
    * rejected_id, chosen_score, rejected_score, margin`.
    */
  def topBottomPairs(
      responses: DataFrame,
      promptCol: String,
      idCol: String,
      scoreCol: String,
      p: Int): DataFrame = {
    require(p >= 1, s"p must be positive, got $p")
    val scored = responses
      .where(col(scoreCol).isNotNull)
      .select(col(promptCol), col(idCol), col(scoreCol))
    // same exchange (hash by prompt) serves both window sorts
    val wTop = Window.partitionBy(col(promptCol)).orderBy(col(scoreCol).desc, col(idCol).asc)
    val wBot = Window.partitionBy(col(promptCol)).orderBy(col(scoreCol).asc, col(idCol).asc)
    val ranked = scored
      .withColumn("__rt", row_number().over(wTop))
      .withColumn("__rb", row_number().over(wBot))
    val top = ranked.where(col("__rt") <= p)
      .select(col(promptCol), col(idCol).as("chosen_id"), col(scoreCol).as("chosen_score"))
    val bottom = ranked.where(col("__rb") <= p)
      .select(col(promptCol), col(idCol).as("rejected_id"), col(scoreCol).as("rejected_score"))
    top.join(bottom, Seq(promptCol))
      .where(col("chosen_score") > col("rejected_score"))
      .select(
        col(promptCol),
        col("chosen_id"),
        col("rejected_id"),
        col("chosen_score"),
        col("rejected_score"),
        (col("chosen_score") - col("rejected_score")).as("margin"))
  }
}
