package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BloomJoin
import graft.sources.Tables

class BloomJoinSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.01"

  test("prefiltered join equals the plain join exactly (no false negatives)") {
    val li = Tables.load(spark, sfDir, "lineitem").select(col("l_orderkey").as("k"), col("l_quantity"))
    val sel = Tables.load(spark, sfDir, "orders")
      .where(col("o_totalprice") > 400000.0)
      .select(col("o_orderkey").as("k"), col("o_totalprice"))
    val plain = li.join(sel, Seq("k"))
    val bloomed = BloomJoin.prefilteredJoin(li, sel, "k")
    assert(bloomed.count() == plain.count())
    assert(bloomed.exceptAll(plain).isEmpty && plain.exceptAll(bloomed).isEmpty)
  }

  test("the bloom filter prunes the big side before the join") {
    val li = Tables.load(spark, sfDir, "lineitem").select(col("l_orderkey").as("k"))
    val sel = Tables.load(spark, sfDir, "orders")
      .where(col("o_totalprice") > 450000.0) // very selective small side
      .select(col("o_orderkey").as("k"))
    val bigRows = li.count().toDouble
    val survivors = BloomJoin.prefilter(li, sel, "k").count().toDouble
    val matches = li.join(sel, Seq("k"), "left_semi").count().toDouble
    assert(survivors < bigRows * 0.25,
      f"prefilter must drop most of the big side: $survivors%.0f of $bigRows%.0f")
    assert(survivors >= matches, "no false negatives")
    val plan = BloomJoin.prefilteredJoin(li, sel, "k").queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"bloom predicate must be in the plan:\n$plan")
  }
}
