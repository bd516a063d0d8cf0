package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.NgramLm

/** Bigram-LM fluency scoring: exact training counts, the smoothing laws
  * (OOV pairs and unseen contexts), quantized-sum partitioning
  * invariance, and surprisal/pooled sign agreement on single-pair docs.
  */
class NgramLmSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  // Reference corpus: "the cat sat" twice, "the dog sat" once →
  // bigrams: (the,cat)=2 (cat,sat)=2 (the,dog)=1 (dog,sat)=1
  private def ref = Seq(
    (1L, "the cat sat"),
    (2L, "the cat sat"),
    (3L, "the dog sat")
  ).toDF("doc_id", "text")

  private def model(minCount: Long = 1L) =
    NgramLm.trainBigramStats(ref, "text", minCount)

  test("training counts pair multiplicity exactly; minCount prunes") {
    val m = model().as[(String, String, Long)].collect().toSet
    assert(m === Set(
      ("the", "cat", 2L), ("cat", "sat", 2L),
      ("the", "dog", 1L), ("dog", "sat", 1L)))
    val pruned = model(minCount = 2L).as[(String, String, Long)].collect().toSet
    assert(pruned === Set(("the", "cat", 2L), ("cat", "sat", 2L)))
  }

  test("surprisal: exact smoothed values, OOV law, short docs absent") {
    // Full model: V = distinct successors {cat,sat,dog} + 1 = 4;
    // ctx(the)=3, ctx(cat)=2, ctx(dog)=1.
    val docs = Seq(
      (10L, "the cat"),       // p = (2+1)/(3+4) = 3/7
      (11L, "zz qq"),         // unseen context → p = 1/V = 1/4
      (12L, "the zz"),        // seen context, OOV pair → p = 1/(3+4)
      (13L, "one"),           // < 2 tokens → absent
      (14L, "")               // empty → absent
    ).toDF("doc_id", "text")
    val s = NgramLm.surprisal(docs, model(), "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(s.keySet === Set(10L, 11L, 12L))
    assert(s(10L)._1 === 1L)
    assert(math.abs(s(10L)._2 - (-math.log(3.0 / 7.0))) < 1e-9)
    assert(math.abs(s(11L)._2 - (-math.log(1.0 / 4.0))) < 1e-9)
    assert(math.abs(s(12L)._2 - (-math.log(1.0 / 7.0))) < 1e-9)
  }

  test("fluent reference-like text scores below garbage") {
    val docs = Seq(
      (1L, "the cat sat the cat sat"),
      (2L, "sat the zz cat qq the")
    ).toDF("doc_id", "text")
    val s = NgramLm.surprisal(docs, model(), "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(s(1L) < s(2L), s"expected fluent < garbage: $s")
  }

  test("quantized sums are partitioning-invariant (bitwise)") {
    val docs = (1L to 200L)
      .map(i => (i, s"the cat sat the dog sat zz$i the cat"))
      .toDF("doc_id", "text")
    def run(parts: Int) =
      NgramLm.surprisal(docs.repartition(parts), model(), "doc_id", "text")
        .as[(Long, Long, Double)].collect().map(r => (r._1, r._3)).sortBy(_._1)
    assert(run(1).sameElements(run(13)))
  }

  test("pooled twin: exact masses and sign agreement with surprisal on single-pair docs") {
    val docs = Seq(
      (10L, "the cat"),   // p = 3/7 ≥ 1/3 → fluent; surprisal ≤ ln 3
      (11L, "zz qq"),     // p = 1/4 < 1/3 → not fluent; surprisal > ln 3
      (12L, "the zz")     // p = 1/7 < 1/3
    ).toDF("doc_id", "text")
    val p = NgramLm.pooledLikelihood(docs, model(), "doc_id", "text", 1L, 3L)
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(p(10L) === ((3L, 7L, true)))
    assert(p(11L) === ((1L, 4L, false)))
    assert(p(12L) === ((1L, 7L, false)))
    val s = NgramLm.surprisal(docs, model(), "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    val cut = -math.log(1.0 / 3.0)
    for (id <- Seq(10L, 11L, 12L))
      assert(p(id)._3 === (s(id) <= cut + 1e-12), s"sign mismatch on $id")
  }

  test("scoring broadcasts the model: no shuffle on the model side of the joins") {
    val docs = Seq((1L, "the cat sat")).toDF("doc_id", "text")
    val plan = NgramLm.surprisal(docs, model(), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"model join must broadcast:\n$plan")
  }
}
