package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Timeseries

class TimeseriesSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val series = Seq(
    ("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 5L, 50.0), // gap: 3, 4
    ("b", 7L, 70.0)                                     // lone row
  ).toDF("k", "period", "v")

  test("gapFill forward-fills missing periods and marks them") {
    val got = Timeseries.gapFill(series, Seq("k"), "period", step = 1L)
      .collect()
      .map(r => (r.getAs[String]("k"), r.getAs[Long]("period"),
        r.getAs[Double]("v"), r.getAs[Boolean]("is_gap")))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq === Seq(
      ("a", 1L, 10.0, false),
      ("a", 2L, 20.0, false),
      ("a", 3L, 20.0, true),  // carried forward from period 2
      ("a", 4L, 20.0, true),
      ("a", 5L, 50.0, false),
      ("b", 7L, 70.0, false)))
  }

  test("gapFill respects a non-unit step") {
    val df = Seq(("a", 0L, 1.0), ("a", 30L, 2.0)).toDF("k", "period", "v")
    val got = Timeseries.gapFill(df, Seq("k"), "period", step = 10L)
      .select("period", "is_gap").as[(Long, Boolean)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((0L, false), (10L, true), (20L, true), (30L, false)))
  }

  test("maxGapPeriods caps the expansion; the rest of the gap stays a hole and is audited") {
    val df = Seq(("a", 0L, 1.0), ("a", 100L, 2.0)).toDF("k", "period", "v")
    val filled = Timeseries.gapFill(df, Seq("k"), "period", step = 1L, maxGapPeriods = 3L)
      .select("period").as[Long].collect().sorted
    assert(filled.toSeq === Seq(0L, 1L, 2L, 3L, 100L), "fill stops at the cap")
    val audit = Timeseries.oversizeGaps(df, Seq("k"), "period", 1L, 3L)
      .collect().map(r => (r.getAs[Long]("period"), r.getAs[Long]("next_period"),
        r.getAs[Long]("gap_periods")))
    assert(audit.toSeq === Seq((0L, 100L, 99L)))
  }

  test("gapFill is one key-partitioned exchange — no spine join") {
    val out = Timeseries.gapFill(series, Seq("k"), "period", step = 1L)
    val plan = out.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1,
      s"gapFill must not join a generated spine:\n$plan")
    assert(!plan.contains("Join"), s"no join allowed:\n$plan")
  }

  test("resample buckets and aggregates into gapFill's contract") {
    val evs = Seq(("a", 12L, 1.0), ("a", 17L, 2.0), ("a", 25L, 4.0))
      .toDF("k", "ts", "v")
    val got = Timeseries.resample(evs, Seq("k"), expr("ts div 10"),
      Seq(sum(col("v")).as("v")))
      .collect().map(r => (r.getAs[Long]("period"), r.getAs[Double]("v"))).sortBy(_._1)
    assert(got.toSeq === Seq((1L, 3.0), (2L, 4.0)))
  }

  test("duplicate (key, period) rows fail loudly instead of emitting garbage") {
    val dup = Seq(("a", 1L, 1.0), ("a", 1L, 2.0)).toDF("k", "period", "v")
    intercept[Exception] {
      Timeseries.gapFill(dup, Seq("k"), "period", step = 1L).collect()
    }
  }
}
