package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level boilerplate line removal (CCNet-style: Wenzek et al. 2020
  * deduplicate at paragraph granularity to drop headers/footers/nav
  * chrome): count how often each normalized line occurs across the whole
  * corpus, then strip the lines that repeat at least `minDf` times.
  *
  * Scale contract: [[lineDf]] is one explode + one hash aggregation — the
  * only shuffle, on the line key, map-side combined. [[stripCommonLines]]
  * then ships the SET of common lines as a hashed plan reference
  * ([[graft.expressions.StringSetContainsExpr]], capped by
  * `maxCommonLines`, loud failure beyond it) so the strip pass is a pure
  * map over the corpus: zero corpus-side shuffle, no join-back, no
  * regroup-by-document, and each line's membership probe is O(1) — NOT
  * the O(|common|) literal-array scan of `array_contains`, which at the
  * cap cost ~10⁵ comparisons per line. Boilerplate is by nature
  * low-cardinality (a line must repeat ≥ minDf times to qualify — at
  * minDf 1000 a 100 TB corpus admits at most corpus_lines/1000 keys, and
  * in practice far fewer); if a corpus genuinely exceeds the cap, raise
  * minDf rather than the cap — the set is driver- and task-resident.
  */
object Boilerplate {

  /** Per-line document frequency over trimmed, non-empty lines:
    * `(line_key, df)`. Counts occurrences (a line repeated within one
    * document counts each time), which is what the strip pass needs: any
    * occurrence past the threshold is chrome wherever it appears.
    */
  def lineDf(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(filter(
        transform(split(col(textCol), "\n"), l => trim(l)),
        l => length(l) > 0)).as("line_key"))
      .groupBy("line_key")
      .agg(count(lit(1)).as("df"))

  /** Remove every line whose corpus-wide df ≥ `minDf`; blank lines are
    * structure, not content, and always survive. Adds `outCol` (the
    * cleaned text, original line order preserved) and `n_lines_dropped`.
    *
    * Two actions over `docs` (the df aggregate, then the strip scan):
    * nondeterministic inputs must be pinned first — the repo's standard
    * two-action contract (see [[Frequency]]).
    */
  def stripCommonLines(
      docs: DataFrame,
      textCol: String,
      minDf: Long,
      maxCommonLines: Int = 100000,
      outCol: String = "text_clean"): DataFrame = {
    require(minDf >= 2L, "minDf < 2 would strip every non-blank line")
    val common = lineDf(docs, textCol)
      .where(col("df") >= minDf)
      .select("line_key")
      .collect()
      .map(_.getString(0))
    require(common.length <= maxCommonLines,
      s"${common.length} common lines exceed maxCommonLines=$maxCommonLines; " +
        "raise minDf (boilerplate should be rare) or the cap")
    import org.apache.spark.sql.graft.ColumnBridge
    val keySet = common.map(org.apache.spark.unsafe.types.UTF8String.fromString).toSeq
    val lines = split(col(textCol), "\n")
    // O(1) hashed membership; blank lines can never be in the set (lineDf
    // filters them), so the length guard is subsumed by the probe itself
    val isCommon = (l: org.apache.spark.sql.Column) =>
      ColumnBridge.column(graft.expressions.StringSetContainsExpr(
        ColumnBridge.eagerExpression(trim(l)), keySet))
    // only common lines are removed, so the dropped count is the length
    // delta — no second membership pass over the array
    val kept = filter(lines, l => !isCommon(l))
    docs
      .withColumn(outCol, array_join(kept, "\n"))
      .withColumn("n_lines_dropped", (size(lines) - size(kept)).cast("long"))
  }
}
