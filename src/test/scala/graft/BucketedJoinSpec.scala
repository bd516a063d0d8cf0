package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Sinks, Tables}

/** Bucketing as the co-located-join strategy: equal bucketing on the join
  * key lets the join run with zero exchanges (and, with in-bucket sort,
  * zero sorts) — the write-once-shuffle-never layout for 100 TB fact
  * tables.
  */
class BucketedJoinSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  test("equally-bucketed tables join with no exchange and no sort") {
    val sfDir = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the SMJ path
    // one-file-per-bucket ordering reporting is opt-in since Spark 3.0
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try {
      Sinks.writeBucketed(
        Tables.load(spark, sfDir, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
        "orders_b", Seq("o_orderkey"), numBuckets = 8, sortCols = Seq("o_orderkey"))
      Sinks.writeBucketed(
        Tables.load(spark, sfDir, "lineitem")
          .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
        "lineitem_b", Seq("o_orderkey"), numBuckets = 8, sortCols = Seq("o_orderkey"))

      val joined = spark.table("orders_b").join(spark.table("lineitem_b"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(!plan.contains("Sort "), s"sorted buckets must not re-sort:\n$plan")

      // correctness: same result as joining the raw tables
      val raw = Tables.load(spark, sfDir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
        .join(
          Tables.load(spark, sfDir, "lineitem")
            .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
          "o_orderkey")
      assert(joined.count() == raw.count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
    }
  }
}
