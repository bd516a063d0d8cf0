package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IncrementalAgg

class IncrementalAggSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val grp = Seq("g")
  private val vals = Seq("v")

  private val a = Seq(("x", 1.0), ("x", 2.0), ("y", 10.0)).toDF("g", "v")
  private val b = Seq(("x", 3.0), ("z", 7.0)).toDF("g", "v")
  private val c = Seq(("y", 4.0), ("z", 5.0)).toDF("g", "v")

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("merge law: merge(state(a), state(b)) == state(a union b)") {
    val merged = IncrementalAgg.merge(
      IncrementalAgg.state(a, grp, vals), IncrementalAgg.state(b, grp, vals), grp)
    val direct = IncrementalAgg.state(a.unionByName(b), grp, vals)
    assert(rows(merged) === rows(direct))
  }

  test("merge is associative and commutative across three shards") {
    val Seq(sa, sb, sc) = Seq(a, b, c).map(IncrementalAgg.state(_, grp, vals))
    val leftFold = IncrementalAgg.merge(IncrementalAgg.merge(sa, sb, grp), sc, grp)
    val rightFold = IncrementalAgg.merge(sa, IncrementalAgg.merge(sc, sb, grp), grp)
    val direct = IncrementalAgg.state(a.unionByName(b).unionByName(c), grp, vals)
    assert(rows(leftFold) === rows(direct))
    assert(rows(rightFold) === rows(direct))
  }

  test("applyDelta folds a raw delta without touching base data") {
    val got = IncrementalAgg.applyDelta(IncrementalAgg.state(a, grp, vals), b, grp, vals)
    val direct = IncrementalAgg.state(a.unionByName(b), grp, vals)
    assert(rows(got) === rows(direct))
  }

  test("retraction subtracts exactly and drops emptied groups") {
    val base = IncrementalAgg.state(a.unionByName(b), grp, vals, withMinMax = false)
    val after = IncrementalAgg.applyDelta(base, b, grp, vals, retract = true)
    val direct = IncrementalAgg.state(a, grp, vals, withMinMax = false)
    // b contributed all of group z — retracting b must remove z entirely
    assert(rows(after) === rows(direct))
    assert(after.where($"g" === "z").isEmpty)
  }

  test("retraction refuses a min/max state") {
    val base = IncrementalAgg.state(a, grp, vals) // withMinMax = true
    val e = intercept[IllegalArgumentException] {
      IncrementalAgg.applyDelta(base, b, grp, vals, retract = true)
    }
    assert(e.getMessage.contains("min/max"))
  }

  test("report decodes avg = sum/n and keeps min/max") {
    val r = IncrementalAgg.report(IncrementalAgg.state(a, grp, vals), grp)
      .where($"g" === "x").head()
    assert(r.getAs[Long]("n") === 2L)
    assert(r.getAs[Double]("sum_v") === 3.0)
    assert(r.getAs[Double]("avg_v") === 1.5)
    assert(r.getAs[Double]("min_v") === 1.0)
    assert(r.getAs[Double]("max_v") === 2.0)
  }

  test("state building is one shuffle; merging is state-sized, not data-sized") {
    val plan = IncrementalAgg.state(a, grp, vals)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1,
      s"state must be a single-exchange aggregate:\n$plan")
  }
}
