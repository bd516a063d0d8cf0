package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Filtering
import graft.operators.Filtering.GopherThresholds

class FilteringSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  // Thresholds sized for tiny fixtures (the defaults need 50+ tokens).
  private val th = GopherThresholds(minTokens = 4L, maxTokens = 100L, minStopwordHits = 1L)

  private val docs = Seq(
    1L -> "the quick brown fox jumps over the lazy dog and then naps",
    2L -> "- the first\n- the second\n- the third\n- the fourth",   // bullet wall
    3L -> "read the more...\nsee the also...\nthe end",             // 2/3 ellipsis lines
    4L -> "# the ## top ### tags ### here ## now",                  // symbol-heavy
    5L -> "12 34 56 78 90 11 22 33 44 55",                          // no alphabetic words
    6L -> "the and of",                                             // too short
    7L -> "",                                                       // empty: all-zero signals
    8L -> "colorless green ideas sleep furiously forever"           // zero stopword hits
  ).toDF("doc_id", "text")

  private lazy val report = Filtering
    .gopherReport(docs, "doc_id", "text", th)
    .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

  test("a natural sentence passes every rule") {
    assert(report(1L).getAs[Boolean]("passes"))
  }

  test("bullet walls fail only the bullet rule") {
    val r = report(2L)
    assert(r.getAs[Double]("bullet_line_ratio") === 1.0)
    assert(!r.getAs[Boolean]("ok_bullets") && !r.getAs[Boolean]("passes"))
    assert(r.getAs[Boolean]("ok_tokens") && r.getAs[Boolean]("ok_stopwords"))
  }

  test("ellipsis-line ratio counts trimmed line suffixes") {
    val r = report(3L)
    assert(math.abs(r.getAs[Double]("ellipsis_line_ratio") - 2.0 / 3.0) < 1e-12)
    assert(!r.getAs[Boolean]("ok_ellipsis"))
  }

  test("symbol ratio counts # and ... per token") {
    val r = report(4L)
    // 11 '#' chars over 10 tokens (the # runs are themselves tokens)
    assert(r.getAs[Double]("symbol_ratio") === 1.1)
    assert(!r.getAs[Boolean]("ok_symbols"))
  }

  test("digit-only docs fail the alphabetic-word rule") {
    val r = report(5L)
    assert(r.getAs[Double]("alpha_word_ratio") === 0.0)
    assert(!r.getAs[Boolean]("ok_alpha"))
  }

  test("token-count bounds and the stopword-presence rule") {
    assert(!report(6L).getAs[Boolean]("ok_tokens"))
    val r8 = report(8L)
    assert(r8.getAs[Long]("stopword_hits") === 0L)
    assert(!r8.getAs[Boolean]("ok_stopwords"))
  }

  test("empty docs produce zero signals, not NaN, and fail") {
    val r = report(7L)
    assert(r.getAs[Long]("n_tokens") === 0L)
    assert(r.getAs[Double]("mean_token_len") === 0.0)
    assert(r.getAs[Double]("alpha_word_ratio") === 0.0)
    assert(r.getAs[Double]("symbol_ratio") === 0.0)
    assert(r.getAs[Double]("bullet_line_ratio") === 0.0)
    assert(!r.getAs[Boolean]("passes"))
  }

  test("gopherFilter keeps exactly the report's passing ids, original columns intact") {
    val kept = Filtering.gopherFilter(docs, "text", th)
    assert(kept.columns.toSeq === Seq("doc_id", "text"),
      "filter must not add report columns")
    val keptIds = kept.select("doc_id").as[Long].collect().toSet
    val passIds = report.collect { case (id, r) if r.getAs[Boolean]("passes") => id }.toSet
    assert(keptIds === passIds)
  }

  test("the filter is one scan with no exchange") {
    val plan = Filtering.gopherFilter(docs, "text", th)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  // --- Per-source quantile cuts ---

  private def scored = (1 to 100).map(i =>
    (i.toLong, if (i <= 80) "big" else if (i <= 96) "small" else "tiny",
      // score = position within the source, descending with id
      (if (i <= 80) 80 - i else if (i <= 96) 96 - i else 100 - i).toLong))
    .toDF("doc_id", "source", "score")

  test("topFractionBySource keeps exactly floor(fraction*n) per source, best first") {
    val kept = Filtering.topFractionBySource(scored, "source", "doc_id", "score", 0.25)
      .select("doc_id", "source").as[(Long, String)].collect().toSet
    // big: n=80 → 20 kept (highest scores = lowest ids 1..20)
    // small: n=16 → 4 kept (ids 81..84); tiny: n=4 → 1 kept (id 97)
    val want = (1L to 20L).map(_ -> "big").toSet ++
      (81L to 84L).map(_ -> "small").toSet + (97L -> "tiny")
    assert(kept === want)
  }

  test("topFractionBySource: ties break by id; sub-quota sources keep nothing") {
    val tied = Seq(
      (5L, "x", 10L), (3L, "x", 10L), (9L, "x", 10L), (1L, "x", 10L),
      (7L, "solo", 99L)
    ).toDF("doc_id", "source", "score")
    val kept = Filtering.topFractionBySource(tied, "source", "doc_id", "score", 0.5)
      .select("doc_id").as[Long].collect().toSet
    // x: 4 rows, all tied → quota 2, deterministic winners = lowest ids
    // solo: floor(0.5 * 1) = 0 → the quota is a fraction, not "at least 1"
    assert(kept === Set(1L, 3L))
  }

  test("aboveQuantileBySource tracks the exact cut within sketch tolerance") {
    val fraction = 0.25
    val exactKept = Filtering.topFractionBySource(scored, "source", "doc_id", "score", fraction)
      .select("doc_id").as[Long].collect().toSet
    val sketch = Filtering.aboveQuantileBySource(scored, "source", "score", fraction, relErr = 0.01)
    assert(sketch.columns.toSeq === scored.columns.toSeq, "cut must not add columns")
    val sketchKept = sketch.select("doc_id").as[Long].collect().toSet
    // inclusive-threshold contract: the quota cut's rows all score at or
    // above the (1-fraction) quantile, so the score cut is a superset …
    assert(exactKept.subsetOf(sketchKept),
      s"exact quota cut must survive the score cut: ${exactKept -- sketchKept} missing")
    // … exceeding each quota by at most the threshold row itself plus the
    // sketch's rank tolerance (scores are distinct per source — no tie mass)
    val quota = Filtering.topFractionBySource(scored, "source", "doc_id", "score", fraction)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    val got = sketch.groupBy("source").count().as[(String, Long)].collect().toMap
    got.foreach { case (src, n) =>
      val q = quota.getOrElse(src, 0L)
      val n0 = scored.where(col("source") === src).count()
      assert(n >= q && n <= q + 1 + math.ceil(0.01 * n0).toLong,
        s"$src: sketch kept $n vs quota $q (n=$n0)")
    }
    // edge fractions
    assert(Filtering.aboveQuantileBySource(scored, "source", "score", 0.0).count() === 0L)
    assert(Filtering.aboveQuantileBySource(scored, "source", "score", 1.0).count() === 100L)
  }

  // --- Head/middle/tail buckets ---

  test("scoreBucketsBySource: exact floor quotas per source, best-first, all rows labeled") {
    val out = Filtering.scoreBucketsBySource(scored, "source", "doc_id", "score", 0.3, 0.4)
      .select("doc_id", "source", "bucket").as[(Long, String, String)].collect()
    assert(out.length === 100, "bucketing relabels, never drops")
    val byBucket = out.groupBy(r => (r._2, r._3)).view.mapValues(_.map(_._1).toSet).toMap
    // big: n=80 → head 24, middle 32, tail 24; scores descend with id
    assert(byBucket(("big", "head")) === (1L to 24L).toSet)
    assert(byBucket(("big", "middle")) === (25L to 56L).toSet)
    assert(byBucket(("big", "tail")) === (57L to 80L).toSet)
    // small: n=16 → head floor(4.8)=4, middle floor(6.4)=6, tail 6
    assert(byBucket(("small", "head")) === (81L to 84L).toSet)
    assert(byBucket(("small", "middle")) === (85L to 90L).toSet)
    assert(byBucket(("small", "tail")) === (91L to 96L).toSet)
    // tiny: n=4 → head 1, middle 1, tail 2
    assert(byBucket(("tiny", "head")) === Set(97L))
    assert(byBucket(("tiny", "middle")) === Set(98L))
    assert(byBucket(("tiny", "tail")) === Set(99L, 100L))
  }

  test("scoreBucketsBySource: quotas are separate floors, ties break by id, null source is a group") {
    // n=10 with h=0.3, m=0.4: ⌊3⌋ + ⌊4⌋ — never ⌊0.7·10⌋ of the summed float
    val tied = ((1 to 10).map(i => (i.toLong, null.asInstanceOf[String], 5L))).toDF("doc_id", "source", "score")
    val out = Filtering.scoreBucketsBySource(tied, "source", "doc_id", "score", 0.3, 0.4)
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    assert((1L to 3L).forall(out(_) == "head"))
    assert((4L to 7L).forall(out(_) == "middle"))
    assert((8L to 10L).forall(out(_) == "tail"))
  }

  test("scoreBucketsBySourceSketch tracks the exact buckets within rank tolerance") {
    val exact = Filtering.scoreBucketsBySource(scored, "source", "doc_id", "score", 0.3, 0.4)
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    val sketch = Filtering.scoreBucketsBySourceSketch(scored, "source", "score", 0.3, 0.4, relErr = 0.01)
    assert(sketch.columns.toSeq === scored.columns.toSeq :+ "bucket")
    val got = sketch.select("doc_id", "bucket").as[(Long, String)].collect().toMap
    assert(got.size === 100)
    // scores are distinct per source; the sketch may shift each boundary
    // by at most ceil(relErr·n) + 1 ranks, so disagreements are confined
    // to that many rows per boundary per source
    val disagrees = exact.keys.count(k => exact(k) != got(k))
    val bound = Seq("big", "small", "tiny").map { src =>
      val n = scored.where(col("source") === src).count()
      2 * (math.ceil(0.01 * n).toLong + 1)
    }.sum
    assert(disagrees <= bound, s"$disagrees bucket disagreements vs allowance $bound")
    // order semantics hold regardless of tolerance: within a source no
    // tail row may outscore a head row
    val rank = Map("head" -> 0, "middle" -> 1, "tail" -> 2)
    val scoreOf = scored.select("doc_id", "score").as[(Long, Long)].collect().toMap
    for (src <- Seq("big", "small", "tiny")) {
      val rows = scored.where(col("source") === src)
        .select("doc_id").as[Long].collect()
        .map(id => (got(id), scoreOf(id))).sortBy(-_._2)
      for (i <- 1 until rows.length if rows(i - 1)._2 != rows(i)._2)
        assert(rank(rows(i - 1)._1) <= rank(rows(i)._1),
          s"$src: lower-scored row in higher bucket (${rows(i - 1)} then ${rows(i)})")
    }
  }

  test("attritionFunnel: hand-computed stages; short-circuit order; NULL verdict drops") {
    // 6 docs through 3 ordered rules. first-fail assignment:
    //   d1 passes all; d2 fails r1; d3 fails r1 AND r3 (counts at r1 only);
    //   d4 fails r2; d5 NULL at r2 (must drop there); d6 fails r3.
    val report = Seq(
      (1L, true, java.lang.Boolean.TRUE, true),
      (2L, false, java.lang.Boolean.TRUE, true),
      (3L, false, java.lang.Boolean.TRUE, false),
      (4L, true, java.lang.Boolean.FALSE, true),
      (5L, true, null.asInstanceOf[java.lang.Boolean], true),
      (6L, true, java.lang.Boolean.TRUE, false))
      .toDF("id", "r1", "r2", "r3")
    val got = graft.operators.Filtering.attritionFunnel(report, Seq("r1", "r2", "r3"))
      .collect()
      .map(r => r.getInt(0) -> ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got(0) === (("r1", 6L, 2L, 4L)), "6 enter r1, d2+d3 drop")
    assert(got(1) === (("r2", 4L, 2L, 2L)), "4 enter r2, d4 + NULL-d5 drop")
    assert(got(2) === (("r3", 2L, 1L, 1L)), "2 enter r3, d6 drops, d1 survives")
    assert(got.size === 3)
  }

  test("attritionFunnel: identity — last surviving equals gopherFilter count") {
    val docs = Seq(
      (1L, "the cat sat on the mat and then the dog ate all of the biscuits before anyone was at home to stop it which was bad"),
      (2L, "zz qq ww"),
      (3L, "a b c d e f g h i j k l m n o p q r s t u v w x y z aa bb cc dd ee ff gg hh ii jj kk ll mm nn oo pp qq rr ss tt")).toDF("doc_id", "text")
    val th = graft.operators.Filtering.GopherThresholds(
      minTokens = 5L, maxTokens = 200L, minStopwordHits = 1L)
    val rules = Seq("ok_tokens", "ok_mean_len", "ok_symbols", "ok_bullets",
      "ok_ellipsis", "ok_alpha", "ok_stopwords")
    val funnel = graft.operators.Filtering.attritionFunnel(
      graft.operators.Filtering.gopherReport(docs, "doc_id", "text", th), rules)
      .orderBy("stage").collect()
    val survived = funnel.last.getLong(4)
    assert(survived === graft.operators.Filtering.gopherFilter(docs, "text", th).count())
    // conservation: every entered = previous surviving; dropped sums to total - survivors
    for (i <- 1 until funnel.length)
      assert(funnel(i).getLong(2) === funnel(i - 1).getLong(4))
    assert(funnel.map(_.getLong(3)).sum === 3L - survived)
  }
}
