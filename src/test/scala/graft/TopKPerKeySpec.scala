package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.TopK

class TopKPerKeySpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val df = Seq(
    ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 20.0), ("a", 4L, 40.0),
    ("b", 5L, 5.0),
    ("c", 6L, 1.0), ("c", 7L, 1.0) // tie on the order value → id tiebreak
  ).toDF("k", "id", "v")

  test("keeps exactly the top-k rows per key by the given order") {
    val out = TopK.perKey(df, Seq("k"), Seq(col("v").desc, col("id").asc), k = 2)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(out("a") == Set(4L, 2L), "top-2 by v desc")
    assert(out("b") == Set(5L), "group smaller than k keeps all")
    assert(out("c") == Set(6L, 7L))
  }

  test("matches the window row_number form on real data") {
    val orders = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val native = TopK.perKey(
      orders, Seq("o_custkey"), Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val windowed = orders.withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
      .drop("rn")
    assert(native.exceptAll(windowed).isEmpty && windowed.exceptAll(native).isEmpty,
      "native operator must reproduce the window form exactly")
  }

  test("plan shape: partial + final exec around one exchange; sort only after pruning") {
    val plan = TopK.perKey(df, Seq("k"), Seq(col("v").desc), 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    val execs = plan.linesIterator.count(_.contains("TopKPerKey "))
    assert(execs == 2, s"expected partial+final, got $execs:\n$plan")
    assert(plan.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1)
    // The final stage streams over SortExec-ordered input (spillable); the
    // sort must sit between exchange and final — i.e. it sorts only the
    // ≤ k×keys pruned rows, never the full input below the partial stage.
    val lines = plan.linesIterator.toSeq
    val sortIdx = lines.indexWhere(_.contains("Sort "))
    val exchangeIdx = lines.indexWhere(_.contains("Exchange hashpartitioning"))
    assert(sortIdx >= 0 && sortIdx < exchangeIdx,
      s"sort must be above the exchange (on pruned rows):\n$plan")
  }

  test("partial-stage flush under a tiny row budget: keys ~ rows, result unchanged") {
    val prev = spark.conf.getOption("spark.graft.topk.maxPartialRows")
    spark.conf.set("spark.graft.topk.maxPartialRows", "97")
    try {
      // every row its own key (worst case for the heap map) plus a handful
      // of real groups; budget forces hundreds of flushes per partition
      val wide = spark.range(10000).select(
        (col("id") % 4000).as("k"), col("id"), (col("id") % 7).cast("double").as("v"))
      val native = TopK.perKey(wide, Seq("k"), Seq(col("v").desc, col("id").asc), 2)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("k").orderBy(col("v").desc, col("id"))
      val windowed = wide.withColumn("rn", row_number().over(w)).where(col("rn") <= 2).drop("rn")
      assert(native.exceptAll(windowed).isEmpty && windowed.exceptAll(native).isEmpty,
        "flushed partials must re-merge to the exact window-form result")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.graft.topk.maxPartialRows", v)
        case None => spark.conf.unset("spark.graft.topk.maxPartialRows")
      }
    }
  }
}
