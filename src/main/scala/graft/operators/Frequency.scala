package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Heavy-hitter detection at corpus scale.
  *
  * The naive form — groupBy(item).count().where(count >= minCount) —
  * shuffles EVERY distinct item: at 100 TB of text that is billions of
  * distinct tokens moving through an exchange to produce a result with a
  * few thousand rows. The two-pass form here never shuffles the long tail:
  *
  *   pass 1  [[graft.expressions.MisraGriesAgg]] — one k-counter mergeable
  *           summary per partition, combined up a normal partial/final
  *           aggregate tree; O(k) state, no key shuffle. Any item with
  *           count > n/(k+1) is guaranteed present (see MisraGriesAgg).
  *   pass 2  exact counts of the ≤ k candidates only: the filter
  *           `item IN (candidates)` prunes the scan output BEFORE the
  *           exchange, so the groupBy shuffles at most k distinct keys.
  *
  * The result is EXACT (not approximate) whenever the sketch is large
  * enough for the threshold — `minCount > n/(k+1)` — which [[heavyHitters]]
  * enforces with a loud failure rather than a silently incomplete answer.
  * (This is the standard candidate-then-verify shape the dedup operators
  * use too: bounded candidate generation, exact verification.)
  */
object Frequency {

  /** One-pass bounded summary: (total item count, candidates with their
    * surviving undercounts, sorted by count desc then item).
    */
  def mgSummary(df: DataFrame, item: Column, k: Int): (Long, Seq[(String, Long)]) = {
    val agg = graft.expressions.MisraGriesAgg(ColumnBridge.eagerExpression(item), k)
      .toAggregateExpression()
    val row = df.agg(ColumnBridge.column(agg).as("mg")).head.getStruct(0)
    val items = row.getSeq[Row](1).map(r => r.getString(0) -> r.getLong(1))
    (row.getLong(0), items)
  }

  /** Exact items with count >= minCount, computed without shuffling the
    * distinct-item long tail. Output: (item, n), one row per heavy hitter.
    *
    * `sketchK` is the memory/threshold dial: exactness requires
    * `minCount > n/(sketchK+1)` (checked — raise sketchK or minCount if it
    * trips). The default 4096 counters cover minCount down to ~0.025% of
    * the corpus.
    */
  def heavyHitters(
      df: DataFrame,
      itemCol: String,
      minCount: Long,
      sketchK: Int = 4096): DataFrame = {
    require(minCount > 0, "minCount must be positive")
    val (n, cand) = mgSummary(df, col(itemCol), sketchK)
    require(minCount.toDouble > n.toDouble / (sketchK + 1),
      s"sketchK=$sketchK cannot guarantee exactness for minCount=$minCount at n=$n " +
        s"(needs minCount > n/(k+1) = ${n / (sketchK + 1)}); raise sketchK")
    // ≤ k candidate literals: an InSet filter evaluated at the scan, so
    // only candidate rows reach the (now tiny, ≤ k keys) exchange.
    df.where(col(itemCol).isin(cand.map(_._1): _*))
      .groupBy(col(itemCol).as("item"))
      .agg(count(lit(1)).as("n"))
      .where(col("n") >= minCount)
  }
}
