package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Preferences

class PreferencesSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def resp(rows: (Long, Long, Option[Int])*) =
    rows.toSeq.toDF("prompt", "id", "score")

  test("pairsByScore: best vs worst, explicit tie-breaks on both sides") {
    val df = resp(
      // prompt 1: clear winner/loser
      (1L, 10L, Some(5)), (1L, 11L, Some(1)), (1L, 12L, Some(3)),
      // prompt 2: chosen tie at score 7 → LOWEST id wins; rejected tie at 2 → lowest id
      (2L, 20L, Some(7)), (2L, 21L, Some(7)), (2L, 22L, Some(2)), (2L, 23L, Some(2)))
    val got = Preferences.pairsByScore(df, "prompt", "id", "score")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Long]("chosen_id") === 10L)
    assert(got(1L).getAs[Long]("rejected_id") === 11L)
    assert(got(1L).getAs[Int]("margin") === 4)
    assert(got(1L).getAs[Long]("n_responses") === 3L)
    assert(got(2L).getAs[Long]("chosen_id") === 20L, "chosen score tie breaks to the lowest id")
    assert(got(2L).getAs[Long]("rejected_id") === 22L, "rejected score tie breaks to the lowest id")
  }

  test("pairsByScore: zero-margin and under-scored prompts emit nothing; NULL scores quarantine") {
    val df = resp(
      (1L, 10L, Some(4)), (1L, 11L, Some(4)), // all tied → no signal
      (2L, 20L, Some(9)), // single response
      (3L, 30L, Some(6)), (3L, 31L, None), // one scored + one NULL → < 2 scored
      (4L, 40L, Some(8)), (4L, 41L, Some(2)), (4L, 42L, None)) // NULL must not rank
    val got = Preferences.pairsByScore(df, "prompt", "id", "score")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got.keySet === Set(4L))
    assert(got(4L).getAs[Long]("chosen_id") === 40L)
    assert(got(4L).getAs[Long]("rejected_id") === 41L,
      "a NULL-scored response must never be picked as rejected")
    assert(got(4L).getAs[Long]("n_responses") === 3L,
      "quarantined responses still count toward n_responses")
  }

  test("topBottomPairs: capped at p^2, positive margin only, matches brute force") {
    val rows = (0L until 20L).map(i => (1L, i, Some(((i * 7) % 12).toInt)))
    val df = resp(rows: _*)
    val got = Preferences.topBottomPairs(df, "prompt", "id", "score", p = 3)
      .collect()
      .map(r => (r.getAs[Long]("chosen_id"), r.getAs[Long]("rejected_id"))).toSet
    // brute force: rank by (score desc, id), (score asc, id)
    val byTop = rows.sortBy { case (_, i, s) => (-s.get, i) }.take(3)
    val byBot = rows.sortBy { case (_, i, s) => (s.get, i) }.take(3)
    val want = for {
      (_, ci, cs) <- byTop; (_, ri, rs) <- byBot if cs.get > rs.get
    } yield (ci, ri)
    assert(got === want.toSet)
    assert(got.size <= 9)
  }

  test("topBottomPairs: both window sorts share ONE exchange") {
    val df = resp((0L until 50L).map(i => (i % 5, i, Some((i % 11).toInt))): _*)
    val out = Preferences.topBottomPairs(df, "prompt", "id", "score", p = 2)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 2, s"top/bottom candidate sides re-use the ranked frame, plan:\n$plan")
  }
}
