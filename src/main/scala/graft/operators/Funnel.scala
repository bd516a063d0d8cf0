package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Funnel (sequential-conversion) analysis: for each user, how far did
  * they progress through an ordered step sequence (view → click →
  * purchase), where each step must occur STRICTLY after the previous
  * one? The per-user semantics is the greedy earliest chain —
  *
  *   t₁ = min ts of step 1;  tᵢ = min ts of step i with ts > tᵢ₋₁
  *
  * — which is exact for funnel existence: any step-i event usable after
  * some earlier chain is also usable after the earliest chain, so greedy
  * never under-counts depth (the standard exchange argument). Greedy is
  * also what makes the semantics ORACLE-EXPRESSIBLE: k chained
  * min-over-filtered-join steps in ANSI SQL reproduce it bit-for-bit.
  *
  * Implementation is NOT the k-join chain: one shuffle total. Events are
  * filtered to the step types in the scan (map-side; the wire carries
  * funnel events only), grouped per user, time-sorted, and folded with
  * the `aggregate` higher-order function advancing a times-so-far array
  * — depth and step times in one pass over each user's events. Tie
  * safety: acceptance depends only on (step index, ts > last-accepted),
  * so equal-timestamp orderings cannot change the outcome (same-step
  * ties record the same ts; cross-step ties fail the strict inequality
  * either way) — the fold is deterministic without a total order.
  *
  * Scale: the exchange carries (user, ts, step_idx) for matching events
  * only; per-user arrays are bounded by that user's funnel activity.
  * Power users inflate one group's array, not the shuffle — and a
  * per-user activity cap belongs upstream (drop users beyond N events
  * via [[Frequency]] candidates) if a corpus has adversarial actors.
  *
  * Output: one row per user who completed ≥ 1 step — `(user, depth,
  * t_1 … t_k)` with tᵢ null past the reached depth. Funnel conversion
  * counts are `groupBy("depth").count()` over this.
  */
object Funnel {

  /** Greedy earliest-chain funnel over `steps` event types. `tsCol` must
    * be an integral (or otherwise strictly ordered, non-null) column —
    * the events table's `ts_ns` long, not a float.
    */
  def earliestChain(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size,
      "repeated step types would need per-occurrence semantics — disambiguate upstream")
    val k = steps.size
    // step name → 0-based index, resolved in the scan stage
    val stepIdx = steps.zipWithIndex
      .foldLeft(lit(null).cast("int")) { case (rest, (s, i)) =>
        when(col(typeCol) === s, lit(i)).otherwise(rest)
      }
    val slim = events
      .select(col(userCol).as("user"), col(tsCol).as("ts"), stepIdx.as("step"))
      .where(col("step").isNotNull)
    val folded = slim
      .groupBy("user")
      .agg(array_sort(collect_list(struct(col("ts"), col("step")))).as("evs"))
      .withColumn("times",
        aggregate(
          col("evs"),
          expr("CAST(array() AS ARRAY<BIGINT>)"),
          (acc, ev) =>
            // sequential CaseWhen: the element_at(acc, -1) arm is only
            // EVALUATED once size(acc) > 0 — under default ANSI mode,
            // element_at on an empty array is an error, so the guard
            // must be a lazy branch, not a conjunct
            when(size(acc) === 0,
              when(ev.getField("step") === 0, array(ev.getField("ts"))).otherwise(acc))
              .when(
                size(acc) < k &&
                  ev.getField("step") === size(acc) &&
                  ev.getField("ts") > element_at(acc, -1),
                concat(acc, array(ev.getField("ts"))))
              .otherwise(acc)))
      .where(size(col("times")) > 0)
    folded.select(
      col("user").as(userCol) +:
        size(col("times")).as("depth") +:
        // try_: indices past the reached depth are null, not an ANSI error
        (1 to k).map(i => try_element_at(col("times"), lit(i)).as(s"t_$i")): _*)
  }

  /** Conversion summary: users reaching each depth (depth d counts users
    * whose chain stopped at EXACTLY d steps). Derived from
    * [[earliestChain]]; the classic funnel chart is the cumulative
    * suffix sum of this.
    */
  def conversion(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String]): DataFrame =
    earliestChain(events, userCol, tsCol, typeCol, steps)
      .groupBy("depth")
      .agg(count(lit(1)).as("n_users"))
}
