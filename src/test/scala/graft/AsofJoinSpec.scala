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

  test("a matched right row with NULL payload yields NULL, not a stale older value") {
    val quotesWithNull = Seq(
      ("A", 10L, Some(1.0)), ("A", 20L, None), // the t=20 quote has no px
      ("A", 30L, Some(3.0)))
      .map { case (s, t, v) => (s, t, v.map(Double.box).orNull) }
      .toDF("sym", "t", "px")
    val out = AsofJoin
      .lastValueJoin(Seq((1L, "A", 25L)).toDF("trade_id", "sym", "t"),
        quotesWithNull, Seq("sym"), "t", Seq("px"))
      .head()
    assert(out.isNullAt(out.fieldIndex("px")),
      "the as-of match is the t=20 row whose px IS NULL — must not fall back to t=10")
  }

  test("multiple value columns come from ONE right row, never mixed") {
    val quotes2 = Seq(
      ("A", 10L, Some(1.0), Some(100.0)),
      ("A", 20L, Some(2.0), None)) // t=20: px set, qty null
      .map { case (s, t, a, b) => (s, t, a.map(Double.box).orNull, b.map(Double.box).orNull) }
      .toDF("sym", "t", "px", "qty")
    val out = AsofJoin
      .lastValueJoin(Seq((1L, "A", 25L)).toDF("trade_id", "sym", "t"),
        quotes2, Seq("sym"), "t", Seq("px", "qty"))
      .head()
    assert(out.getAs[Double]("px") == 2.0)
    assert(out.isNullAt(out.fieldIndex("qty")),
      "qty must come from the t=20 row (null), not the t=10 row (100.0)")
  }

  test("left payload columns pass through untouched") {
    val out = AsofJoin.lastValueJoin(trades, quotes, Seq("sym"), "t", Seq("px"))
    assert(out.columns.toSet == Set("trade_id", "sym", "t", "px"))
    assert(out.count() == 6)
  }
}
