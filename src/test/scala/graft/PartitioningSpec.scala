package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Partitioning

class PartitioningSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  test("runningSum equals the single-window form without its SinglePartition exchange") {
    val df = spark.range(100000).select(col("id"), (col("id") % 7 + 1).as("v"))
    val fast = Partitioning.runningSum(df, "id", "v", "rt", numPartitions = 16)
    val w = org.apache.spark.sql.expressions.Window.orderBy("id")
    val slow = df.withColumn("rt", sum(col("v")).over(w))
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty,
      "two-phase prefix sum must reproduce the global window exactly")
    val p = fast.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange SinglePartition"),
      s"the whole point: no single-partition window in the plan:\n$p")
    val pSlow = slow.queryExecution.executedPlan.toString
    assert(pSlow.contains("Exchange SinglePartition"),
      "sanity: the naive form really does degenerate to one partition")
  }

  test("runningSum rejects non-integral value columns (float prefix sums are order-dependent)") {
    val df = spark.range(10).select(col("id"), col("id").cast("double").as("v"))
    intercept[IllegalArgumentException] {
      Partitioning.runningSum(df, "id", "v")
    }
  }
}
