package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsofJoin

class AsofJoinSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val quotes = Seq( // (sym, t, px)
    ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
    ("B", 15L, 9.0)).toDF("sym", "t", "px")
  private val trades = Seq( // (trade_id, sym, t)
    (1L, "A", 5L),   // before any quote → null
    (2L, "A", 20L),  // exactly at a quote
    (3L, "A", 25L),  // between quotes → 20's px
    (4L, "A", 99L),  // after all → latest
    (5L, "B", 15L),
    (6L, "C", 50L)). // key with no quotes → null
    toDF("trade_id", "sym", "t")

  private def run(strict: Boolean) =
    AsofJoin.lastValueJoin(trades, quotes, Seq("sym"), "t", Seq("px"), strict = strict)
      .select("trade_id", "px").collect()
      .map(r => r.getAs[Long]("trade_id") -> Option(r.getAs[java.lang.Double]("px")).map(_.toDouble))
      .toMap

  test("non-strict (>=): same-instant quote is visible") {
    val m = run(strict = false)
    assert(m(1L).isEmpty)
    assert(m(2L).contains(2.0), "t=20 trade sees the t=20 quote")
    assert(m(3L).contains(2.0))
    assert(m(4L).contains(3.0))
    assert(m(5L).contains(9.0))
    assert(m(6L).isEmpty, "key with no reference rows stays null")
  }

  test("strict (>): same-instant quote is NOT visible") {
    val m = run(strict = true)
    assert(m(2L).contains(1.0), "t=20 trade only sees the t=10 quote")
    assert(m(3L).contains(2.0))
    assert(m(5L).isEmpty, "B's only quote is at the same instant")
  }

  test("left payload columns pass through untouched") {
    val out = AsofJoin.lastValueJoin(trades, quotes, Seq("sym"), "t", Seq("px"))
    assert(out.columns.toSet == Set("trade_id", "sym", "t", "px"))
    assert(out.count() == 6)
  }
}
