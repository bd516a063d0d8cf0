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

  test("raw events are scanned once (single source scan in the plan)") {
    val plan = Cohorts.retention(evs, "user_id", col("sec"), 10L)
      .queryExecution.optimizedPlan.toString
    assert("LocalRelation|LogicalRDD".r.findAllIn(plan).size === 1,
      s"events must not be re-scanned for the cohort pass:\n$plan")
  }
}
