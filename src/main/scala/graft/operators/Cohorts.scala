package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cohort retention: bucket users by the period of their FIRST activity
  * (the cohort) and count, for each later period, how many of them came
  * back — the (cohort × age) retention matrix behind every "week-4
  * retention" chart, and the aggregate dual of [[Funnel]]'s per-user
  * sequencing.
  *
  * Periods are integer buckets `ts div periodSeconds` of an integral
  * epoch-seconds column — plain long division, so cohort assignment and
  * ages are exact, engine-agnostic (oracle-gated end to end), and
  * calendar-policy-free (a period is EXACTLY `periodSeconds`, no DST or
  * month-length semantics; pass pre-truncated calendar buckets if those
  * semantics are wanted).
  *
  * Shape: raw events are scanned ONCE (plan-asserted). The scan's
  * partial aggregation dedups (user, period) map-side — the wire
  * carries one row per user-period, not per event (a user's thousandth
  * click that week adds nothing) — and the cohort is a window
  * `min(period) over user` on the DEDUPLICATED pairs, not a join back
  * to a second aggregate of the source (the join formulation reads the
  * events table twice; at 100 TB the second scan IS the cost). Because
  * the pairs are distinct, each user contributes exactly one row per
  * age, so the matrix is a plain count over (cohort, age) —
  * cohort-cardinality² keys, trivial.
  *
  * Output: (cohort, age, n_users) where age counts periods since the
  * cohort period (age 0 = the cohort's own size at that granularity).
  * Retention RATES are a self-join of this against its age-0 slice —
  * left to the caller/BI layer, as rates lose the counts.
  */
object Cohorts {

  def retention(
      events: DataFrame,
      userCol: String,
      epochSecCol: Column,
      periodSeconds: Long): DataFrame = {
    require(periodSeconds > 0, "periodSeconds must be positive")
    // exact floor division on longs: subtract the positive remainder,
    // then INTEGRAL `div` — exact for the full long range. (A double `/`
    // here would silently round for |epochSec| ≥ 2^53 — e.g. a caller
    // passing nanoseconds instead of seconds — putting boundary rows in
    // the wrong bucket with no error.)
    val a = epochSecCol.cast("long")
    val p = lit(periodSeconds)
    val userPeriods = events
      .select(
        col(userCol).as("user"),
        call_function("div", a - pmod(a, p), p).as("period"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user")
    userPeriods
      .withColumn("cohort", min(col("period")).over(w))
      .groupBy(col("cohort"), (col("period") - col("cohort")).as("age"))
      .agg(count(lit(1)).as("n_users"))
  }
}
