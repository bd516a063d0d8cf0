package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, CurationConfig, Filtering}

/** The composed curation chain: each stage filters exactly what its
  * standalone operator would, stage order is observable (dedup sees
  * CLEANED text), and disabled stages are true no-ops.
  */
class CurationSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  // A corpus where every stage has work:
  //  - docs 1/2: same content up to a boilerplate footer → equal after
  //    strip, deduped (keeper 1)
  //  - doc 3: too short → gopher kills it
  //  - doc 4: clean survivor
  //  - doc 5: a benchmark copy → decontamination kills it
  //  - docs 6/7: source B, 7 beats 6 on tokens → top-half cut keeps 7
  private val footer = "subscribe to our newsletter today"
  private def corpus = Seq(
    (1L, "A", s"the data table holds many good rows today\n$footer"),
    (2L, "A", s"the data table holds many good rows today\n$footer\n$footer"),
    (3L, "A", "the end"),
    (4L, "A", s"the quick brown fox jumps over a lazy dog again\n$footer"),
    (5L, "A", s"the secret eval answer is forty two exactly here\n$footer"),
    (6L, "B", s"the small doc has just eight words here\n$footer"),
    (7L, "B", s"the bigger doc has quite a few more words in it here\n$footer")
  ).toDF("doc_id", "source", "text")

  private def bench = Seq("the secret eval answer is forty two exactly here").toDF("text")

  private val cfg = CurationConfig(
    gopher = Some(Filtering.GopherThresholds(
      minTokens = 5L, maxTokens = 100L, minStopwordHits = 1L)),
    boilerplateMinDf = Some(3L),
    benchmark = Some(bench),
    contaminationN = 3,
    maxContamination = 0.2,
    keepTopFraction = Some(0.5))

  test("full chain: strip → filter → dedup → decontaminate → cut, in that order") {
    val out = Curation.run(corpus, cfg)
    val kept = out.select("doc_id").as[Long].collect().toSet
    // A: 1≡2 after strip (keeper 1), 3 too short, 5 contaminated → {1, 4};
    //    top-half of {1, 4} keeps floor(0.5·2)=1 doc — 4 has more tokens
    // B: {6, 7} → keeps 7
    assert(kept === Set(4L, 7L), s"got $kept")
    // the footer is gone from surviving text, and the audit col exists
    val t4 = out.where(col("doc_id") === 4L).select("text").as[String].head()
    assert(!t4.contains(footer))
    assert(out.columns.contains("n_lines_dropped"))
  }

  test("dedup runs on CLEANED text: footer variants collapse only when stripping is on") {
    val noStrip = cfg.copy(boilerplateMinDf = None, keepTopFraction = None,
      benchmark = None)
    val ids = Curation.run(corpus, noStrip).select("doc_id").as[Long].collect().toSet
    // without the strip, docs 1 and 2 differ (footer count) → both survive
    assert(Set(1L, 2L).subsetOf(ids), s"got $ids")
    val strip = noStrip.copy(boilerplateMinDf = Some(3L))
    val ids2 = Curation.run(corpus, strip).select("doc_id").as[Long].collect().toSet
    assert(ids2.contains(1L) && !ids2.contains(2L),
      s"cleaned duplicates must collapse to the min-id keeper: $ids2")
  }

  test("an all-default-off config is the identity") {
    val out = Curation.run(corpus,
      CurationConfig(gopher = None, exactDedup = false))
    assert(out.schema === corpus.schema)
    assert(out.count() === corpus.count())
  }

  test("gopher-only config stays shuffle-free") {
    val plan = Curation.run(corpus,
      CurationConfig(gopher = Some(Filtering.GopherThresholds(minTokens = 1L,
        minStopwordHits = 0L)), exactDedup = false))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
