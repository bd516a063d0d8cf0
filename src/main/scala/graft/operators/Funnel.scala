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
  * Power users inflate one group's array, not the shuffle — and
  * `maxEventsPerUser` bounds even that: users with more funnel events
  * than the cap are EXCLUDED from the result (their groups never
  * materialize an array) and surface in the [[oversizeUsers]] audit view
  * instead — the same bounded, observable contract as `maxBucket`/
  * `maxBlock` elsewhere in the repo. The occupancy count is a window
  * over the same user key the fold groups on, so the cap adds no
  * exchange.
  *
  * `maxStepGap` adds the per-step conversion window every real funnel
  * query phrases ("step i within T of step i−1"): step i is accepted
  * only when `tᵢ₋₁ < ts ≤ tᵢ₋₁ + T`. The semantics stays the GREEDY
  * earliest chain — the product-analytics convention, and exactly what
  * the chained min-join SQL with the same window reproduces — NOT a
  * max-depth search over alternative chains (with a window, a later
  * step-1 event can occasionally reach deeper; greedy answers "the
  * first chain", which is the convention and the oracle-expressible
  * definition).
  *
  * Output: one row per user who completed ≥ 1 step — `(user, depth,
  * t_1 … t_k)` with tᵢ null past the reached depth. Funnel conversion
  * counts are `groupBy("depth").count()` over this.
  */
object Funnel {

  private def slimEvents(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size,
      "repeated step types would need per-occurrence semantics — disambiguate upstream")
    // step name → 0-based index, resolved in the scan stage
    val stepIdx = steps.zipWithIndex
      .foldLeft(lit(null).cast("int")) { case (rest, (s, i)) =>
        when(col(typeCol) === s, lit(i)).otherwise(rest)
      }
    events
      .select(col(userCol).as("user"), col(tsCol).as("ts"), stepIdx.as("step"))
      .where(col("step").isNotNull)
  }

  /** Greedy earliest-chain funnel over `steps` event types. `tsCol` must
    * be an integral (or otherwise strictly ordered, non-null) column —
    * the events table's `ts_ns` long, not a float. `maxStepGap` (same
    * unit as `tsCol`) bounds each step's distance from the previous
    * accepted one; `maxEventsPerUser` routes pathological actors to
    * [[oversizeUsers]] instead of one OOM'd task.
    */
  def earliestChain(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String],
      maxStepGap: Option[Long] = None,
      maxEventsPerUser: Long = Long.MaxValue): DataFrame = {
    val k = steps.size
    val slim = slimEvents(events, userCol, tsCol, typeCol, steps)
    val capped =
      if (maxEventsPerUser == Long.MaxValue) slim
      else Blocking.withOccupancy(slim, Seq("user"))
        .where(col("__occ") <= maxEventsPerUser)
        .drop("__occ")
    val folded = capped
      .groupBy("user")
      .agg(array_sort(collect_list(struct(col("ts"), col("step")))).as("evs"))
      .withColumn("times",
        aggregate(
          col("evs"),
          expr("CAST(array() AS ARRAY<BIGINT>)"),
          (acc, ev) => {
            // sequential CaseWhen: the element_at(acc, -1) arm is only
            // EVALUATED once size(acc) > 0 — under default ANSI mode,
            // element_at on an empty array is an error, so the guard
            // must be a lazy branch, not a conjunct
            val afterLast = ev.getField("ts") > element_at(acc, -1)
            val inWindow = maxStepGap match {
              case Some(g) => afterLast &&
                ev.getField("ts") - element_at(acc, -1) <= lit(g)
              case None => afterLast
            }
            when(size(acc) === 0,
              when(ev.getField("step") === 0, array(ev.getField("ts"))).otherwise(acc))
              .when(
                size(acc) < k && ev.getField("step") === size(acc) && inWindow,
                concat(acc, array(ev.getField("ts"))))
              .otherwise(acc)
          }))
      .where(size(col("times")) > 0)
    folded.select(
      col("user").as(userCol) +:
        size(col("times")).as("depth") +:
        // try_: indices past the reached depth are null, not an ANSI error
        (1 to k).map(i => try_element_at(col("times"), lit(i)).as(s"t_$i")): _*)
  }

  /** Audit view of the users [[earliestChain]]'s cap excluded: (user,
    * n_events) over users whose FUNNEL-event count (post step filter)
    * exceeds `maxEventsPerUser`. Same single-shuffle shape as the fold.
    */
  def oversizeUsers(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String],
      maxEventsPerUser: Long): DataFrame =
    slimEvents(events, userCol, tsCol, typeCol, steps)
      .groupBy(col("user").as(userCol))
      .agg(count(lit(1)).as("n_events"))
      .where(col("n_events") > maxEventsPerUser)

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
