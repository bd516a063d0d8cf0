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

  test("runningSum with duplicate order keys: ROWS semantics, exact even when ties straddle partition boundaries") {
    // 100k rows over only 50 distinct order values and 16 range partitions:
    // every boundary necessarily splits a tie group
    val df = spark.range(100000).select((col("id") % 50).as("k"), lit(1L).as("v"))
    val out = Partitioning.runningSum(df, "k", "v", "rt", numPartitions = 16)
    // ROWS semantics: per order key the running totals are a contiguous
    // integer range ending at the peers-inclusive (RANGE) total
    val perKey = out.groupBy("k")
      .agg(min("rt").as("lo"), max("rt").as("hi"), count(lit(1)).as("n"))
      .collect()
      .map(r => r.getAs[Long]("k") -> ((r.getAs[Long]("lo"), r.getAs[Long]("hi"), r.getAs[Long]("n"))))
      .toMap
    (0L until 50L).foreach { k =>
      val (lo, hi, n) = perKey(k)
      assert(n == 2000)
      assert(hi == (k + 1) * 2000, s"k=$k: max running total must equal the RANGE-frame total")
      assert(lo == k * 2000 + 1, s"k=$k: ROWS accumulation starts right after the previous key")
    }
    // totals are a permutation-free sequence: distinct count == row count
    assert(out.select("rt").distinct().count() == 100000)
  }

  test("runningSum rejects non-integral value columns (float prefix sums are order-dependent)") {
    val df = spark.range(10).select(col("id"), col("id").cast("double").as("v"))
    intercept[IllegalArgumentException] {
      Partitioning.runningSum(df, "id", "v")
    }
  }
}
