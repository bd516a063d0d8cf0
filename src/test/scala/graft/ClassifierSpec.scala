package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Classifier

/** Reference-vs-crawl classifier semantics: exact training counts, the
  * quantized-log score against a driver-side recompute, partitioning
  * invariance (the determinism the quantization buys), and twin
  * agreement.
  */
class ClassifierSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  // reference docs speak "wiki", crawl docs speak "spam"
  private def labeled = Seq(
    (1L, true, "wiki facts wiki cite"),
    (2L, true, "facts cite neutral"),
    (3L, false, "spam click spam buy"),
    (4L, false, "click buy now"),
    (5L, false, "spam now")
  ).toDF("doc_id", "is_ref", "text")

  test("trainTermStats: exact class counts, minCount pruning, null labels dropped") {
    val withNull = labeled.union(
      Seq((6L, Option.empty[Boolean], "wiki wiki wiki")).toDF("doc_id", "is_ref", "text"))
    val m = Classifier.trainTermStats(withNull, "is_ref", "text")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(m("wiki") === ((2L, 0L)), "null-labeled docs must not train")
    assert(m("spam") === ((0L, 3L)))
    assert(m("now") === ((0L, 2L)))
    assert(m("neutral") === ((1L, 0L)))
    val pruned = Classifier.trainTermStats(withNull, "is_ref", "text", minCount = 2L)
      .select("term").as[String].collect().toSet
    assert(!pruned.contains("neutral") && pruned.contains("spam"))
  }

  test("scoreNB matches a driver-side recompute and separates the classes") {
    val model = Classifier.trainTermStats(labeled, "is_ref", "text")
    val stats = model.collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val nPos = stats.values.map(_._1).sum
    val nNeg = stats.values.map(_._2).sum
    val v = stats.size.toLong
    val cq = math.round(math.log((nNeg + v).toDouble / (nPos + v).toDouble) * 1e12)
    def wq(t: String): Long = stats.get(t).map { case (p, n) =>
      math.rint(math.log((p + 1).toDouble / (n + 1).toDouble) * 1e12).toLong
    }.getOrElse(0L)
    def expected(text: String): Double = {
      val toks = text.split("\\s+").filter(_.nonEmpty)
      (toks.map(wq).sum + toks.length * cq).toDouble / 1e12
    }
    val probe = Seq(
      (10L, "wiki cite facts"),     // reference-like
      (11L, "spam buy click spam"), // crawl-like
      (12L, "zzz qqq")              // pure OOV → n·C
    ).toDF("doc_id", "text")
    val got = Classifier.scoreNB(probe, model, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(got(10L) - expected("wiki cite facts")) < 1e-9)
    assert(math.abs(got(11L) - expected("spam buy click spam")) < 1e-9)
    assert(math.abs(got(12L) - expected("zzz qqq")) < 1e-9)
    assert(got(10L) > 0.0 && got(11L) < 0.0, s"classes must separate: $got")
  }

  test("scoreNB is bit-identical under repartitioning (quantized integer sums)") {
    val docs = (1 to 200).map(i =>
      (i.toLong, if (i % 2 == 0) "wiki facts cite spam" else "click buy wiki now spam spam"))
      .toDF("doc_id", "text")
    val model = Classifier.trainTermStats(labeled, "is_ref", "text")
    val a = Classifier.scoreNB(docs, model, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = Classifier.scoreNB(docs.repartition(7), model, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a === b, "scores must not depend on partitioning")
  }

  test("oddsMass: exact masses, OOV contributes 1 per token, sign agrees on clear cases") {
    val model = Classifier.trainTermStats(labeled, "is_ref", "text")
    val probe = Seq(
      (10L, "wiki cite facts"),
      (11L, "spam buy click spam"),
      (12L, "zzz")
    ).toDF("doc_id", "text")
    val got = Classifier.oddsMass(probe, model, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    // wiki (2,0) cite (2,0) facts (2,0) → pos_mass 3·3=9, neg_mass 3·1=3
    assert(got(10L)._1 === 9L)
    assert(got(10L)._2 === 3L)
    assert(got(10L)._3, "reference doc must classify reference-like")
    assert(!got(11L)._3, "crawl doc must not")
    // pure OOV: masses 1,1 → decision = prior comparison (nNeg+v vs nPos+v)
    assert(got(12L)._1 === 1L && got(12L)._2 === 1L)
    val nbSigns = Classifier.scoreNB(probe, model, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1) > 0)).toMap
    assert(nbSigns(10L) === got(10L)._3 && nbSigns(11L) === got(11L)._3,
      "twins must agree on clearly separated docs")
  }

  test("calibrationReport: exact bin membership, empty bins reported, rates match a recompute") {
    val model = Classifier.trainTermStats(labeled, "is_ref", "text")
    val out = Classifier.calibrationReport(labeled, model, "doc_id", "text", "is_ref", bins = 4)
      .collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(out.keySet === Set(0, 1, 2, 3), "every bin must be present, populated or not")
    // driver recompute of the exact binning
    val odds = Classifier.oddsMass(labeled, model, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val mTotals = model.collect().map(r =>
      (r.getAs[Long]("pos_tf"), r.getAs[Long]("neg_tf")))
    val (np, nn, v) = (mTotals.map(_._1).sum, mTotals.map(_._2).sum, mTotals.length.toLong)
    val labels = labeled.collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val expected = odds.map { case (id, pm, nm) =>
      val pmN = BigInt(pm) * (nn + v); val nmN = BigInt(nm) * (np + v)
      val bin = (1 until 4).count(j => pmN * 4 > (pmN + nmN) * j)
      (bin, labels(id))
    }.groupBy(_._1).map { case (b, xs) => b -> ((xs.size.toLong, xs.count(_._2).toLong)) }
    (0 until 4).foreach { b =>
      val (n, p) = expected.getOrElse(b, (0L, 0L))
      assert(out(b)._1 === n && out(b)._2 === p, s"bin $b")
      val rate = if (n == 0) 0.0 else p.toDouble / n
      assert(out(b)._3 === rate)
      assert(out(b)._4 === b / 4.0 && out(b)._5 === (b + 1) / 4.0)
    }
    // sanity on this corpus: reference docs score in higher bins than crawl
    val refBins = odds.map { case (id, pm, nm) =>
      val pmN = BigInt(pm) * (nn + v); val nmN = BigInt(nm) * (np + v)
      (labels(id), (1 until 4).count(j => pmN * 4 > (pmN + nmN) * j))
    }
    val hiRef = refBins.filter(_._1).map(_._2).min
    val loCrawl = refBins.filterNot(_._1).map(_._2).max
    assert(hiRef > loCrawl, s"separable corpus must calibrate monotonically: $refBins")
  }
}
