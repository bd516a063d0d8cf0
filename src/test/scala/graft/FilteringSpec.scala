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
}
