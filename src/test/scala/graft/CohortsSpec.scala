package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cohorts

class CohortsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  // period = 10s buckets. u1: periods 0,1,3; u2: 1,2; u3: 1 only.
  private val evs = Seq(
    (1L, 0L), (1L, 5L),          // u1 twice in period 0 — dedup to one
    (1L, 12L), (1L, 31L),
    (2L, 10L), (2L, 25L),
    (3L, 19L)
  ).toDF("user_id", "sec")

  private def matrix = Cohorts.retention(evs, "user_id", col("sec"), 10L)
    .collect()
    .map(r => (r.getAs[Long]("cohort"), r.getAs[Long]("age")) -> r.getAs[Long]("n_users"))
    .toMap

  test("cohort = first-activity period; ages count periods since") {
    assert(matrix === Map(
      (0L, 0L) -> 1L, (0L, 1L) -> 1L, (0L, 3L) -> 1L, // u1
      (1L, 0L) -> 2L,                                  // u2, u3
      (1L, 1L) -> 1L                                   // u2 returns
    ))
  }

  test("multiple events in one period count a user once") {
    assert(matrix((0L, 0L)) === 1L)
  }

  test("boundary seconds land in the exact floor bucket") {
    val edge = Seq((1L, 9L), (1L, 10L), (2L, 19L), (2L, 20L)).toDF("user_id", "sec")
    val m = Cohorts.retention(edge, "user_id", col("sec"), 10L)
      .collect()
      .map(r => (r.getAs[Long]("cohort"), r.getAs[Long]("age")) -> r.getAs[Long]("n_users"))
      .toMap
    // u1: periods 0,1; u2: periods 1,2
    assert(m === Map((0L, 0L) -> 1L, (0L, 1L) -> 1L, (1L, 0L) -> 1L, (1L, 1L) -> 1L))
  }

  test("bucketing is exact beyond 2^53 (nanosecond clocks bucket correctly)") {
    // double division would misplace boundary values at this magnitude
    val week = 604800L * 1000000000L
    // bucket-aligned base ≈ 1.7e18 ≫ 2^53
    val base = (1700000000L * 1000000000L / week) * week
    val ns = Seq(
      (1L, base), (1L, base + week - 1L), // same bucket
      (1L, base + week)                   // next bucket — off-by-one under rounding
    ).toDF("user_id", "ns")
    val m = Cohorts.retention(ns, "user_id", col("ns"), week)
      .collect().map(r => r.getAs[Long]("age") -> r.getAs[Long]("n_users")).toMap
    assert(m === Map(0L -> 1L, 1L -> 1L))
  }

  test("null user ids are excluded, matching COUNT(DISTINCT user) oracle semantics") {
    val dirty = Seq(
      (java.lang.Long.valueOf(1L), 0L), (java.lang.Long.valueOf(1L), 12L),
      (null.asInstanceOf[java.lang.Long], 0L),
      (null.asInstanceOf[java.lang.Long], 12L))
      .toDF("user_id", "sec")
    val m = Cohorts.retention(dirty, "user_id", col("sec"), 10L)
      .collect().map(r => r.getAs[Long]("age") -> r.getAs[Long]("n_users")).toMap
    assert(m === Map(0L -> 1L, 1L -> 1L), "the null phantom user must not count")
    val cal = Cohorts.retentionCalendar(
      dirty, "user_id", timestamp_seconds(col("sec")), "week")
      .agg(sum("n_users")).head().getLong(0)
    assert(cal === 1L, "calendar face excludes nulls the same way")
  }

  test("retentionRates: base size from age 0, one exactly-rounded division") {
    val r = Cohorts.retentionRates(evs, "user_id", col("sec"), 10L)
      .collect()
      .map(row => (row.getAs[Long]("cohort"), row.getAs[Long]("age")) ->
        ((row.getAs[Long]("n_users"), row.getAs[Long]("cohort_size"), row.getAs[Double]("rate"))))
      .toMap
    assert(r((1L, 0L)) === ((2L, 2L, 1.0)))
    assert(r((1L, 1L)) === ((1L, 2L, 0.5)))
    assert(r((0L, 3L)) === ((1L, 1L, 1.0)))
    assert(r.values.forall { case (_, _, rate) => rate > 0.0 && rate <= 1.0 })
  }

  test("retentionCalendar: Monday-truncated weeks, whole-week ages; month mode") {
    // 2024-01-01 is a Monday. Events on Mon 1st, Sun 7th (same ISO week),
    // Mon 8th (next week), and Thu 2024-02-01 (month boundary).
    def ts(s: String) = to_timestamp(lit(s))
    val evs2 = Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-07 23:00:00"),
      (1L, "2024-01-08 00:00:00"), (2L, "2024-01-03 12:00:00"),
      (1L, "2024-02-01 09:00:00"))
      .toDF("user_id", "t")
    val wk = Cohorts.retentionCalendar(evs2, "user_id", to_timestamp(col("t")), "week")
      .collect()
      .map(r => (r.getAs[java.sql.Date]("cohort").toString, r.getAs[Int]("age")) -> r.getAs[Long]("n_users"))
      .toMap
    // u1 cohort 2024-01-01: ages 0 (Jan 1+7), 1 (Jan 8), 4 (Feb 1 week = Jan 29)
    // u2 cohort 2024-01-01: age 0
    assert(wk === Map(
      ("2024-01-01", 0) -> 2L,
      ("2024-01-01", 1) -> 1L,
      ("2024-01-01", 4) -> 1L))
    val mo = Cohorts.retentionCalendar(evs2, "user_id", to_timestamp(col("t")), "month")
      .collect()
      .map(r => (r.getAs[java.sql.Date]("cohort").toString, r.getAs[Int]("age")) -> r.getAs[Long]("n_users"))
      .toMap
    assert(mo === Map(
      ("2024-01-01", 0) -> 2L,
      ("2024-01-01", 1) -> 1L))
  }

  test("raw events are scanned once (single source scan in the plan)") {
    val plan = Cohorts.retention(evs, "user_id", col("sec"), 10L)
      .queryExecution.optimizedPlan.toString
    assert("LocalRelation|LogicalRDD".r.findAllIn(plan).size === 1,
      s"events must not be re-scanned for the cohort pass:\n$plan")
  }
}
