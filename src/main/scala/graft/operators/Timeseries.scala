package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regularizing event data into gapless per-key time series — the
  * resample → gap-fill → forward-fill shape every metrics/feature
  * pipeline needs before windowed models see the data.
  *
  * [[gapFill]] deliberately does NOT build a calendar spine and join
  * (the textbook formulation: per-key min/max agg + sequence + explode +
  * LEFT join + last-ignore-nulls window = three exchanges). Instead each
  * row generates the periods UP TO its successor via one LEAD window and
  * `sequence`/`explode`: the originating row's values ride along, so
  * forward fill is free, and the whole operator is ONE key-partitioned
  * exchange with map-side expansion after it. The expansion is
  * data-dependent (a 2-row key spanning years explodes to thousands of
  * rows); `maxGapPeriods` caps it per gap — capped gaps stay holes, and
  * [[oversizeGaps]] audits them — the repo's standard cap-and-audit
  * contract for adversarial inputs.
  *
  * Input contract: one row per (key, period) — run [[resample]] (or any
  * groupBy) first; duplicate periods would make the LEAD step negative
  * and `sequence` raises loudly rather than emitting garbage.
  */
object Timeseries {

  /** Bucket + aggregate sugar: events → one row per (keys, period), where
    * `periodExpr` is integral (epoch seconds/days/hours — floor-divide
    * upstream). The output satisfies [[gapFill]]'s uniqueness contract.
    */
  def resample(
      df: DataFrame,
      keys: Seq[String],
      periodExpr: Column,
      aggs: Seq[Column]): DataFrame = {
    require(aggs.nonEmpty, "resample needs at least one aggregate")
    df.groupBy((keys.map(col) :+ periodExpr.as("period")): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Fill missing periods per key with the most recent row's values
    * (forward fill), marking generated rows `is_gap = true`. `step` is
    * the period stride (1 for already-bucketed longs). Trailing edges
    * are not extended: each key's series ends at its own last period.
    * Gaps longer than `maxGapPeriods` are filled only that far — the
    * remainder stays a hole and the gap surfaces in [[oversizeGaps]].
    */
  def gapFill(
      df: DataFrame,
      keys: Seq[String],
      periodCol: String,
      step: Long,
      maxGapPeriods: Long = Long.MaxValue): DataFrame = {
    require(keys.nonEmpty, "gapFill needs key columns")
    require(step > 0L, "step must be positive")
    require(maxGapPeriods > 0L, "maxGapPeriods must be positive")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(periodCol))
    val valueCols = df.columns.filterNot(c => c == periodCol || keys.contains(c))
    // fill target: one step short of the successor, capped; lone/last rows
    // fill nothing (coalesce to the row's own period). Computed as its own
    // column: a window function cannot sit inside the generator, and the
    // uncapped arm must not materialize period + MaxValue (ANSI overflow).
    val uncapped = coalesce(lead(col(periodCol), 1).over(w) - step, col(periodCol))
    val fillTo =
      if (maxGapPeriods == Long.MaxValue) uncapped
      else least(uncapped, col(periodCol) + lit(maxGapPeriods * step))
    df
      .withColumn("__orig", col(periodCol))
      .withColumn("__fill_to", fillTo)
      .withColumn(periodCol, explode(sequence(col("__orig"), col("__fill_to"), lit(step))))
      .withColumn("is_gap", col(periodCol) > col("__orig"))
      .select((keys.map(col) :+ col(periodCol)) ++
        valueCols.map(col) :+ col("is_gap"): _*)
  }

  /** Audit of gaps [[gapFill]] truncated: `(keys…, period, next_period,
    * gap_periods)` for every successor gap exceeding `maxGapPeriods`.
    * Same single-exchange shape as the fill.
    */
  def oversizeGaps(
      df: DataFrame,
      keys: Seq[String],
      periodCol: String,
      step: Long,
      maxGapPeriods: Long): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(periodCol))
    df.select(keys.map(col) :+ col(periodCol): _*)
      .withColumn("next_period", lead(col(periodCol), 1).over(w))
      .withColumn("gap_periods", expr(s"(next_period - `$periodCol`) div ${step}L - 1"))
      .where(col("gap_periods") > maxGapPeriods)
  }
}
