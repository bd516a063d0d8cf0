package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: keep a grouped rollup current under
  * new data WITHOUT rescanning history — materialized-view maintenance as
  * an operator. A 100 TB fact table with a daily rollup must not pay a
  * full re-aggregation per refresh; it should aggregate the NEW partition
  * only (one shuffle over the delta) and fold that into the stored state
  * (a state-sized merge). This is the same semigroup discipline as
  * [[Profile]] (mergeable sketch rows) applied to plain SQL aggregates.
  *
  * State row per group: `n` (count), and per tracked value column `c`:
  * `sum_<c>` (exact: decimal(38,6) accumulation — float sums would make
  * the merge law approximate and order-dependent), `min_<c>`, `max_<c>`.
  * Derived aggregates (avg = sum/n) belong in [[report]], never in state
  * — averages do not merge, (sum, n) pairs do.
  *
  * Laws (pinned by IncrementalAggSpec):
  *   - `merge(state(a), state(b)) ≡ state(a union b)` — count/sum by
  *     addition, min/max by min/max; associative and commutative, so
  *     shard/day/partition states fold in any order.
  *   - `merge(s, emptyState) ≡ s` (identity).
  *   - retraction: `applyDelta(s, delta, retract = true)` subtracts
  *     counts/sums exactly — valid for count/sum/avg, NOT for min/max
  *     (a deleted row may have carried the extremum; min/max are not
  *     retractable without full recompute, the standard incremental-view
  *     limitation). Retraction therefore REQUIRES the state to be built
  *     with `withMinMax = false`, enforced loudly.
  *
  * Scale shape: [[state]] is one shuffle over its input with map-side
  * partial aggregation; [[merge]] is a state-sized groupBy (states are
  * group-cardinality rows, not data) — the 100 TB history is never
  * touched after its state is first built. Groups vanished from a merged
  * state (n = 0 after retraction) are dropped.
  */
object IncrementalAgg {

  // Exact accumulation type: 2-decimal money and integral quantities are
  // exact in scale-6 decimal, and decimal addition is order-free where
  // double addition is not (the merge law must be EXACT, not within-ulp).
  private val Acc = "decimal(38,6)"

  private def sumc(c: String) = s"sum_$c"
  private def minc(c: String) = s"min_$c"
  private def maxc(c: String) = s"max_$c"

  /** Aggregate `df` into one mergeable state row per group. */
  def state(
      df: DataFrame,
      groupCols: Seq[String],
      valueCols: Seq[String],
      withMinMax: Boolean = true): DataFrame = {
    require(valueCols.nonEmpty, "track at least one value column")
    val aggs =
      Seq(count(lit(1)).as("n")) ++
        valueCols.map(c => sum(col(c).cast(Acc)).as(sumc(c))) ++
        (if (withMinMax)
          valueCols.flatMap(c => Seq(min(col(c)).as(minc(c)), max(col(c)).as(maxc(c))))
        else Nil)
    df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Fold two state frames of identical shape into one: counts and sums
    * add, min/max take min/max. Groups present in only one side pass
    * through. One state-sized shuffle.
    */
  def merge(a: DataFrame, b: DataFrame, groupCols: Seq[String]): DataFrame = {
    require(a.columns.toSeq == b.columns.toSeq,
      s"state shapes differ: ${a.columns.mkString(",")} vs ${b.columns.mkString(",")}")
    val cols = a.columns.toSeq.filterNot(groupCols.contains)
    val folded = a.unionByName(b)
      .groupBy(groupCols.map(col): _*)
      .agg(
        aggFor(cols.head), cols.tail.map(aggFor): _*)
    folded.where(col("n") =!= 0)
  }

  private def aggFor(c: String) = c match {
    case "n" => sum(col("n")).as("n")
    case s if s.startsWith("sum_") => sum(col(s)).as(s)
    case m if m.startsWith("min_") => min(col(m)).as(m)
    case m if m.startsWith("max_") => max(col(m)).as(m)
    case other => throw new IllegalArgumentException(s"not a state column: $other")
  }

  /** Fold a raw delta frame into an existing state: aggregate the delta
    * (one shuffle over the delta ONLY), negate it if retracting, merge.
    * Retraction demands a min/max-free state (see object doc) and that
    * the delta rows were genuinely present — over-retraction surfaces as
    * dropped (n = 0) or negative-n groups, the caller's contract.
    */
  def applyDelta(
      stateDf: DataFrame,
      delta: DataFrame,
      groupCols: Seq[String],
      valueCols: Seq[String],
      retract: Boolean = false): DataFrame = {
    val hasMinMax = stateDf.columns.exists(_.startsWith("min_"))
    require(!(retract && hasMinMax),
      "retraction cannot maintain min/max — build the state with withMinMax = false")
    val d = state(delta, groupCols, valueCols, withMinMax = hasMinMax)
    val signed =
      if (!retract) d
      else d.select(
        groupCols.map(col) ++ d.columns.filterNot(groupCols.contains).map {
          case "n" => (-col("n")).as("n")
          case s => (-col(s)).as(s)
        }: _*)
    merge(stateDf, signed, groupCols)
  }

  /** Reader-facing view of a state: derived aggregates decoded (avg =
    * sum/n as double), sums surfaced as double. Runs on state-sized data.
    */
  def report(stateDf: DataFrame, groupCols: Seq[String]): DataFrame = {
    val sums = stateDf.columns.filter(_.startsWith("sum_")).toSeq
    val rest = stateDf.columns.toSeq
      .filterNot(groupCols.contains).filterNot(_ == "n").filterNot(sums.contains)
    stateDf.select(
      groupCols.map(col) ++ Seq(col("n")) ++
        sums.flatMap(s => Seq(
          col(s).cast("double").as(s),
          // cast the EXACT decimal sum to double first, then one IEEE
          // division — decimal-division scale rules differ across
          // engines, double division does not
          (col(s).cast("double") / col("n").cast("double"))
            .as("avg_" + s.stripPrefix("sum_")))) ++
        rest.map(col): _*)
  }
}
