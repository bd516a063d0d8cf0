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

  test("pairsByScore: STRING ids keep the documented tie-break (no numeric-negation hazard)") {
    // the old id*-1 tie-break cast string ids to NULL (non-ANSI), making
    // the chosen side aggregation-order-dependent; the score-negating
    // form must order string ids lexicographically on both sides
    val df = Seq(
      ("p", "resp-b", Some(7)), ("p", "resp-a", Some(7)), // chosen tie → 'resp-a'
      ("p", "resp-d", Some(2)), ("p", "resp-c", Some(2))) // rejected tie → 'resp-c'
      .toDF("prompt", "id", "score")
    val r = Preferences.pairsByScore(df, "prompt", "id", "score").head()
    assert(r.getAs[String]("chosen_id") === "resp-a")
    assert(r.getAs[String]("rejected_id") === "resp-c")
    assert(r.getAs[Int]("chosen_score") === 7 && r.getAs[Int]("rejected_score") === 2)
    // double scores take the fractional-negation branch
    val d = Seq(("p", "x", Some(1.5)), ("p", "y", Some(0.25)))
      .toDF("prompt", "id", "score")
    val rd = Preferences.pairsByScore(d, "prompt", "id", "score").head()
    assert(rd.getAs[String]("chosen_id") === "x" && rd.getAs[Double]("margin") === 1.25)
    // non-numeric scores refuse loudly
    val bad = Seq(("p", "x", "high")).toDF("prompt", "id", "score")
    assertThrows[IllegalArgumentException](
      Preferences.pairsByScore(bad, "prompt", "id", "score"))
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

  test("groupRelativeAdvantage: hand-computed z-scores, NULL quarantine, zero variance") {
    val df = resp(
      // prompt 1: rewards 1,2,3,6 → n=4, S=12, Q=50, n·Q−S²=56
      (1L, 10L, Some(1)), (1L, 11L, Some(2)), (1L, 12L, Some(3)), (1L, 13L, Some(6)),
      // prompt 2: constant rewards → zero variance → advantage 0
      (2L, 20L, Some(5)), (2L, 21L, Some(5)),
      // prompt 3: one NULL quarantined, two scored
      (3L, 30L, Some(0)), (3L, 31L, Some(4)), (3L, 32L, None))
    val got = Preferences.groupRelativeAdvantage(df, "prompt", "id", "score")
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getLong(4))).toMap
    def adv(n: Long, r: Long, s: Long, q: Long) =
      (n * r - s).toDouble / math.sqrt((n * q - s * s).toDouble)
    assert(got(10L)._1.get === adv(4, 1, 12, 50))
    assert(got(13L)._1.get === adv(4, 6, 12, 50))
    assert(math.abs(got.collect { case (i, (Some(a), _)) if Seq(10L, 11L, 12L, 13L).contains(i) => a }.sum) < 1e-12,
      "advantages sum to ~0 within a group")
    assert(got(20L)._1.get === 0.0 && got(21L)._1.get === 0.0)
    assert(got(32L)._1.isEmpty, "NULL reward → NULL advantage, row stays visible")
    assert(got(32L)._2 === 2L, "quarantined rows still report the group's scored count")
    assert(got(30L)._1.get === adv(2, 0, 4, 16), "moments exclude the quarantined row")
  }

  test("groupRelativeAdvantage rejects non-integral rewards loudly") {
    val df = Seq((1L, 10L, 1.5)).toDF("prompt", "id", "score")
    val e = intercept[IllegalArgumentException] {
      Preferences.groupRelativeAdvantage(df, "prompt", "id", "score")
    }
    assert(e.getMessage.contains("integral"))
  }

  test("rejectionSample: threshold + explicit total order, NULLs never pass, native plan") {
    val df = resp(
      (1L, 10L, Some(9)), (1L, 11L, Some(9)), (1L, 12L, Some(7)),
      (1L, 13L, Some(5)), (1L, 14L, Some(3)), (1L, 15L, None),
      (2L, 20L, Some(2)))
    val out = Preferences.rejectionSample(df, "prompt", "id", "score", minScore = 5L, perPrompt = 3)
    assert(out.queryExecution.executedPlan.toString.contains("TopKPerKey"),
      "the per-prompt cut must ride the bounded-heap native plan")
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ties at 9 break to the lowest id; 5 makes the cut, 3 and NULL don't; prompt 2 all below
    assert(got === Set((1L, 10L), (1L, 11L), (1L, 12L)))
  }

  test("clipRewards: exact order-statistic cuts, clamp, NULL passthrough, n=1 identity") {
    // prompt 1: scores 1..10 (ids 11..20); p20/p80 → ranks 2 and 8 → cuts 2 and 8
    val df = resp(
      (1L to 10L).map(i => (1L, 10L + i, Some(i.toInt))) ++ Seq(
        (1L, 99L, None), // NULL rides along unclipped
        (2L, 200L, Some(7))): _*) // single rating: lo = hi = 7, identity
    val got = Preferences.clipRewards(df, "prompt", "id", "score", pLo = 0.2, pHi = 0.8)
      .collect().map(r => r.getLong(1) ->
        ((if (r.isNullAt(r.fieldIndex("clipped_reward"))) None
          else Some(r.getAs[Int]("clipped_reward"))),
          r.getAs[Int]("lo"), r.getAs[Int]("hi"))).toMap
    assert(got(11L) === ((Some(2), 2, 8)), "below p20 clamps up to the exact rank-2 value")
    assert(got(12L) === ((Some(2), 2, 8)))
    assert(got(15L) === ((Some(5), 2, 8)), "interior values untouched")
    assert(got(18L) === ((Some(8), 2, 8)))
    assert(got(20L) === ((Some(8), 2, 8)), "above p80 clamps down")
    assert(got(99L)._1 === None, "NULL rewards pass through as NULL clipped values")
    assert(got(200L) === ((Some(7), 7, 7)), "a single-rating group clips to itself")
  }

  test("lengthBiasReport: hand-computed sums, verbosity-reward and healthy witnesses") {
    def texts(toks: (Long, Int)*) =
      toks.toSeq.map { case (id, n) => (id, Seq.fill(n)("w").mkString(" ")) }.toDF("id", "text")
    // verbosity-rewarded set: margin strictly tracks length delta → corr 1
    val biased = Seq((1L, 10L, 20L, 5), (2L, 11L, 21L, 3), (3L, 12L, 22L, 8))
      .toDF("prompt", "chosen_id", "rejected_id", "margin")
    val biasedTexts = texts(
      10L -> 15, 20L -> 10, // delta 5 = margin
      11L -> 5, 21L -> 2, // delta 3
      12L -> 9, 22L -> 1) // delta 8
    val b = Preferences.lengthBiasReport(biased, biasedTexts, "id", "text").head()
    assert(b.getAs[Long]("n_pairs") === 3L && b.getAs[Long]("chosen_longer") === 3L)
    assert(b.getAs[Double]("chosen_longer_frac") === 1.0)
    assert(math.abs(b.getAs[Double]("margin_len_corr") - 1.0) < 1e-12,
      "margin == length delta is the pure verbosity reward")
    // healthy set: deltas negate margins' order → strong NEGATIVE corr; and
    // exact Pearson against an independent mirror
    val pairs2 = Seq((1L, 10L, 20L, 9), (2L, 11L, 21L, 4), (3L, 12L, 22L, 1))
      .toDF("prompt", "chosen_id", "rejected_id", "margin")
    val texts2 = texts(10L -> 1, 20L -> 8, 11L -> 5, 21L -> 5, 12L -> 9, 22L -> 2)
    val h = Preferences.lengthBiasReport(pairs2, texts2, "id", "text").head()
    val xs = Seq(1 - 8, 5 - 5, 9 - 2).map(_.toDouble)
    val ys = Seq(9, 4, 1).map(_.toDouble)
    val n = 3.0
    val corr = (n * xs.zip(ys).map { case (a, c) => a * c }.sum - xs.sum * ys.sum) /
      (math.sqrt(n * xs.map(a => a * a).sum - xs.sum * xs.sum) *
        math.sqrt(n * ys.map(a => a * a).sum - ys.sum * ys.sum))
    assert(h.getAs[Double]("margin_len_corr") === corr)
    assert(h.getAs[Long]("chosen_longer") === 1L)
    assert(h.getAs[Double]("mean_len_delta") === 0.0)
    // degenerate variance → 0, not NaN
    val flat = Seq((1L, 10L, 20L, 5), (2L, 11L, 21L, 5))
      .toDF("prompt", "chosen_id", "rejected_id", "margin")
    val f = Preferences.lengthBiasReport(
      flat, texts(10L -> 3, 20L -> 1, 11L -> 4, 21L -> 2), "id", "text").head()
    assert(f.getAs[Double]("margin_len_corr") === 0.0, "constant margin has no correlation")
    // fractional margins refuse loudly — a 0.7 margin would silently
    // truncate to 0 under the old cast and zero the correlation
    val frac = Seq((1L, 10L, 20L, 0.7)).toDF("prompt", "chosen_id", "rejected_id", "margin")
    assertThrows[IllegalArgumentException](
      Preferences.lengthBiasReport(frac, texts(10L -> 3, 20L -> 1), "id", "text"))
  }

  // ---- Bradley–Terry fixed-point integer MM ----

  /** Independent sequential mirror of the integer MM recurrence —
    * the hitsReference discipline: plain Scala Longs, same order of
    * operations per round, no Spark.
    */
  private def btReference(
      games: Seq[(Long, Long)],
      iters: Int,
      scale: Long = 1000000L): Map[Long, Long] = {
    val pairs = (games.map { case (w, l) => (w, l) } ++ games.map { case (w, l) => (l, w) })
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val wins = games.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val ids = pairs.keys.map(_._1).toSeq.distinct
    var v = ids.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val den = ids.map { a =>
        a -> pairs.collect {
          case ((`a`, b), n) if v(a) + v(b) > 0 => n * scale * scale / (v(a) + v(b))
        }.sum
      }.toMap
      val raw = ids.map { a =>
        val w = wins.getOrElse(a, 0L)
        a -> (if (w == 0L || den(a) == 0L) 0L else w * scale * scale / den(a))
      }.toMap
      val mx = math.max(raw.values.max, 1L)
      v = raw.view.mapValues(r => r * scale / mx).toMap
    }
    v
  }

  private def gamesDf(games: Seq[(Long, Long)]) = games.toDF("winner", "loser")

  test("bradleyTerryInt matches the integer recurrence and recovers a planted order") {
    // 3 items: 2 beats 1 (3 of 4), 1 beats 0 (3 of 4), 2 beats 0 (4 of 4)
    val games = Seq(
      (2L, 1L), (2L, 1L), (2L, 1L), (1L, 2L),
      (1L, 0L), (1L, 0L), (1L, 0L), (0L, 1L),
      (2L, 0L), (2L, 0L), (2L, 0L), (2L, 0L))
    val got = Preferences.bradleyTerryInt(gamesDf(games), "winner", "loser", iters = 5)
      .collect().map(r => r.getAs[Long]("item_id") ->
        (r.getAs[Long]("wins"), r.getAs[Long]("games"), r.getAs[Long]("strength"))).toMap
    val want = btReference(games, 5)
    assert(got.view.mapValues(_._3).toMap === want)
    assert(got(2L)._3 > got(1L)._3 && got(1L)._3 > got(0L)._3,
      "strengths must recover the planted dominance order")
    assert(got(2L)._3 === 1000000L, "max-normalize pins the strongest item at scale")
    assert(got(0L)._1 === 1L && got(0L)._2 === 8L, "exact win/game tallies")
  }

  test("bradleyTerryInt: zero-win items settle at 0 and never poison denominators") {
    // 9 always loses to everyone; 8 loses to 7 but beats 9
    val games = Seq((7L, 8L), (7L, 9L), (8L, 9L), (7L, 9L))
    val got = Preferences.bradleyTerryInt(gamesDf(games), "winner", "loser", iters = 4)
      .collect().map(r => r.getAs[Long]("item_id") -> r.getAs[Long]("strength")).toMap
    assert(got === btReference(games, 4))
    assert(got(9L) === 0L, "a zero-win item's MM fixed point is 0")
    assert(got(7L) === 1000000L && got(8L) > 0L && got(8L) < got(7L))
  }

  test("bradleyTerryInt is exactly reproducible under a different physical layout") {
    val games = (0L until 400L).map { i =>
      val a = i % 13; val b = (i * 7 + 3) % 13
      if ((i * 31 + 5) % 97 < 48 + (a - b) * 4) (a, b) else (b, a)
    }.filter { case (a, b) => a != b }
    def run(parts: Int) =
      Preferences.bradleyTerryInt(gamesDf(games).repartition(parts), "winner", "loser", iters = 3)
        .collect().map(r => r.getAs[Long]("item_id") -> r.getAs[Long]("strength")).toMap
    val a = run(1)
    assert(a === run(17), "integer rounds are aggregation-order-independent")
    assert(a === btReference(games, 3))
  }
}
