package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.IntervalJoin

class IntervalJoinSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def pairs(
      ls: Seq[(Long, Long, Long)],
      rs: Seq[(Long, Long, Long)],
      width: Long): (Set[(Long, Long)], Seq[(Long, Long)], String) = {
    val l = ls.toDF("l_id", "l_s", "l_e")
    val r = rs.toDF("r_id", "r_s", "r_e")
    val out = IntervalJoin.overlap(l, r, "l_s", "l_e", "r_s", "r_e", width)
    val rows = out.collect().map(x => (x.getAs[Long]("l_id"), x.getAs[Long]("r_id"))).toSeq
    (rows.toSet, rows, out.queryExecution.executedPlan.toString)
  }

  private def brute(
      ls: Seq[(Long, Long, Long)],
      rs: Seq[(Long, Long, Long)]): Set[(Long, Long)] =
    (for {
      (li, lsv, lev) <- ls if lev > lsv
      (ri, rsv, rev) <- rs if rev > rsv
      if lsv < rev && rsv < lev
    } yield (li, ri)).toSet

  test("matches the brute-force theta join; each pair emitted exactly once") {
    val rnd = new scala.util.Random(7)
    val ls = (1L to 120L).map(i => (i, rnd.nextInt(300).toLong, 0L))
      .map { case (i, s, _) => (i, s, s + 1 + rnd.nextInt(40)) }
    val rs = (1L to 120L).map(i => (1000 + i, rnd.nextInt(300).toLong, 0L))
      .map { case (i, s, _) => (i, s, s + 1 + rnd.nextInt(25)) }
    for (width <- Seq(1L, 7L, 32L, 1000L)) { // much smaller / near / much larger than spans
      val (got, raw, _) = pairs(ls, rs, width)
      assert(got === brute(ls, rs), s"width $width")
      assert(raw.size === got.size, s"width $width: no duplicate emissions")
    }
  }

  test("boundary semantics: half-open intervals — touching endpoints do not overlap") {
    val (got, _, _) = pairs(
      Seq((1L, 0L, 10L), (2L, 10L, 20L)),
      Seq((9L, 10L, 15L), (8L, 9L, 10L)),
      4L)
    // [0,10) vs [10,15): touch at 10 → no; [0,10) vs [9,10): yes
    // [10,20) vs [10,15): yes;      [10,20) vs [9,10): touch → no
    assert(got === Set((1L, 8L), (2L, 9L)))
  }

  test("empty and inverted intervals match nothing; bucket-spanning intervals found") {
    val (got, _, _) = pairs(
      Seq((1L, 5L, 5L), (2L, 9L, 3L), (3L, 0L, 1000L)), // empty, inverted, huge
      Seq((7L, 400L, 401L)),
      16L)
    assert(got === Set((3L, 7L)), "only the spanning interval overlaps; degenerates drop")
  }

  test("the plan is an equi-join on buckets — no cartesian, no nested loop") {
    val ls = (1L to 50L).map(i => (i, i * 3, i * 3 + 10))
    val rs = (1L to 50L).map(i => (100 + i, i * 2, i * 2 + 5))
    val (_, _, plan) = pairs(ls, rs, 8L)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"binning must equi-join, plan:\n$plan")
  }

  test("backtick-hostile column names (spaces, hyphens) bucket correctly") {
    // the old string-interpolated expr() failed to parse these; bucket
    // math must never re-parse caller names
    val l = Seq((1L, 0L, 10L), (2L, 50L, 60L)).toDF("left id", "start ts", "end-ts")
    val r = Seq((9L, 5L, 8L), (8L, 59L, 70L)).toDF("right id", "r start", "r-end")
    val out = IntervalJoin.overlap(l, r, "start ts", "end-ts", "r start", "r-end", 4L)
      .select(col("left id"), col("right id"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(out === Set((1L, 9L), (2L, 8L)))
  }

  test("overlapping column names are rejected loudly") {
    val l = Seq((1L, 2L, 3L)).toDF("id", "s", "e")
    val r = Seq((1L, 2L, 3L)).toDF("id", "rs", "re")
    val ex = intercept[IllegalArgumentException] {
      IntervalJoin.overlap(l, r, "s", "e", "rs", "re", 4L)
    }
    assert(ex.getMessage.contains("disjoint"))
  }
}
