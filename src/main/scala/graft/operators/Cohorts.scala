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
  * month-length semantics). [[retentionCalendar]] is the calendar-bucket
  * face: `date_trunc`-aligned week/month cohorts for when those
  * semantics ARE wanted.
  *
  * NULL users are EXCLUDED from every face: a null user id is not an
  * identity, and counting the null group as one phantom "user" (what a
  * raw groupBy/window would do) silently diverges from any
  * COUNT(DISTINCT user) formulation. Filter upstream if null means
  * something in a given corpus.
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
  * [[retentionRates]] adds (cohort_size, rate) via a matrix-sized window
  * — never a second pass over events.
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
      .where(col(userCol).isNotNull)
      .select(
        col(userCol).as("user"),
        call_function("div", a - pmod(a, p), p).as("period"))
      .distinct()
    matrix(userPeriods)
  }

  /** Calendar-bucket retention: periods are `date_trunc(unit, ts)` dates
    * (ISO weeks start Monday; months at day 1), age counts whole periods
    * between cohort and activity — the week/month cohort chart with real
    * calendar semantics instead of fixed-seconds buckets.
    */
  def retentionCalendar(
      events: DataFrame,
      userCol: String,
      tsCol: Column,
      unit: String): DataFrame = {
    require(Seq("week", "month").contains(unit), s"unit must be week|month, got $unit")
    val userPeriods = events
      .where(col(userCol).isNotNull)
      .select(
        col(userCol).as("user"),
        date_trunc(unit, tsCol).cast("date").as("period"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user")
    val withCohort = userPeriods.withColumn("cohort", min(col("period")).over(w))
    // truncated periods differ by whole units, so both ages are exact
    // integers: week diffs are multiples of 7 days, month diffs are what
    // months_between reports as an integral double
    val age = unit match {
      case "week" =>
        call_function("div", datediff(col("period"), col("cohort")).cast("long"), lit(7L))
          .cast("int")
      case "month" =>
        months_between(col("period"), col("cohort")).cast("int")
    }
    withCohort
      .groupBy(col("cohort"), age.as("age"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** The matrix plus per-cohort base size and retention rate: cohort_size
    * is the age-0 count pulled across each cohort's rows by a
    * matrix-sized window (age 0 always exists — the cohort period is the
    * min), and rate = n_users / cohort_size is ONE correctly-rounded
    * division — oracle-exact. No second events scan, no self-join.
    */
  def retentionRates(
      events: DataFrame,
      userCol: String,
      epochSecCol: Column,
      periodSeconds: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("cohort")
    retention(events, userCol, epochSecCol, periodSeconds)
      .withColumn("cohort_size",
        max(when(col("age") === 0, col("n_users"))).over(w))
      .select(
        col("cohort"), col("age"), col("n_users"), col("cohort_size"),
        (col("n_users").cast("double") / col("cohort_size").cast("double")).as("rate"))
  }

  private def matrix(userPeriods: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user")
    userPeriods
      .withColumn("cohort", min(col("period")).over(w))
      .groupBy(col("cohort"), (col("period") - col("cohort")).as("age"))
      .agg(count(lit(1)).as("n_users"))
  }
}
