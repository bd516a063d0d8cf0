package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Caches, Decontaminate}

class DecontaminateSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  // n=3 word-grams. bench doc grams: {a b c, b c d}, {x y z}
  private val bench = Seq(
    (100L, "a b c d"),
    (101L, "x y z"))
    .toDF("id", "text")

  private val docs = Seq(
    (1L, "a b c d"), // fully contained: grams {a b c, b c d} both hit → 1.0
    (2L, "a b c q r s"), // grams {a b c, b c q, c q r, q r s}: 1 of 4 hit → 0.25
    (3L, "p q r s t"), // grams {p q r, q r s, r s t}: no overlap → 0.0
    (4L, "xy"), // shorter than n: whole doc is one gram, no hit → 0.0
    (5L, null.asInstanceOf[String])) // null text → null profile
    .toDF("id", "text")

  test("overlap: per-doc gram counts, hits, and ratio") {
    val out = Decontaminate.overlap(docs, "text", "id", bench, "text", n = 3)
      .collect()
      .map(r => r.getAs[Long]("id") ->
        (Option(r.getAs[java.lang.Long]("doc_ngrams")),
          Option(r.getAs[java.lang.Long]("hit_ngrams")),
          Option(r.getAs[java.lang.Double]("contamination"))))
      .toMap
    assert(out(1L) == ((Some(2L), Some(2L), Some(1.0))))
    assert(out(2L) == ((Some(4L), Some(1L), Some(0.25))))
    assert(out(3L) == ((Some(3L), Some(0L), Some(0.0))))
    assert(out(4L) == ((Some(1L), Some(0L), Some(0.0))))
    assert(out(5L) == ((None, None, None)), "null text → undefined profile")
    Caches.release()
  }

  test("clean keeps only docs at or below the ratio, drops unmeasurable ones") {
    val kept = Decontaminate.clean(docs, "text", "id", bench, "text", n = 3, maxRatio = 0.25)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L, 4L), "doc 1 too contaminated; null doc 5 dropped")
    Caches.release()
  }

  test("a doc that IS a benchmark doc is fully contaminated") {
    val out = Decontaminate.overlap(
      Seq((1L, "x y z")).toDF("id", "text"), "text", "id", bench, "text", n = 3)
      .collect()
    assert(out.head.getAs[Double]("contamination") == 1.0)
    Caches.release()
  }

  test("corpusOverlap: pairwise containment, zero-overlap rows present, self-pairs absent") {
    val corpus = Seq(
      ("A", "a b c d"),        // grams {a b c, b c d}
      ("A", "a b c"),          // duplicate gram within A counts once
      ("A", "   "),            // blank doc: shingles to [""] — must NOT be a gram
      ("B", "b c d e"),        // grams {b c d, c d e} → shares {b c d} with A
      ("B", ""),               // blank doc in a second group: would phantom-share "" with A
      ("C", "x y z w"),        // grams {x y z, y z w} → disjoint from A and B
      ("C", null.asInstanceOf[String]))
      .toDF("source", "text")
    val out = Decontaminate.corpusOverlap(corpus, "text", "source", n = 3)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    assert(out.size === 6, "3 groups -> 6 ordered pairs, self-pairs excluded")
    // A and B each hold a blank doc: the empty gram is dropped from the
    // inventory, so it neither inflates grams_a nor phantom-shares
    assert(out(("A", "B")) === ((2L, 2L, 1L, 0.5)))
    assert(out(("B", "A")) === ((2L, 2L, 1L, 0.5)))
    // the audit must REPORT clean pairs, not omit them
    assert(out(("A", "C")) === ((2L, 2L, 0L, 0.0)))
    assert(out(("C", "B")) === ((2L, 2L, 0L, 0.0)))
    Caches.release()
  }

  test("corpus-side plan has no shuffle before the per-doc aggregate") {
    // the only exchange in the hits branch must carry one row per doc (the
    // groupBy), not the exploded grams: assert the semi-join is broadcast
    val plan = Decontaminate.overlap(docs, "text", "id", bench, "text", n = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"bench gram set must broadcast:\n$plan")
    Caches.release()
  }

  test("corpusOverlapSketch tracks the exact face within the compounded HLL band") {
    // three sources with substantial, ASYMMETRIC overlap: B contains most
    // of A, C is disjoint — the sketch must rank these correctly and land
    // each estimate inside the compounded-stderr band of the exact value
    import spark.implicits._
    val base = (1 to 400).map(i => s"alpha$i bravo$i charlie$i delta$i echo$i")
    val docs = (
      base.take(300).zipWithIndex.map { case (t, i) => (s"A", s"$t x$i") } ++
      base.zipWithIndex.map { case (t, i) => (s"B", s"$t y$i") } ++
      (1 to 300).map(i => (s"C", s"zulu$i yankee$i xray$i whiskey$i victor$i"))
    ).toDF("source", "text")
    val exact = Decontaminate.corpusOverlap(docs, "text", "source", n = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(4)))).toMap
    Caches.release()
    val est = Decontaminate.corpusOverlapSketch(docs, "text", "source", n = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(4)))).toMap
    assert(est.keySet === exact.keySet, "same pair grid, self-pairs absent")
    for ((pair, (gA, shared)) <- exact) {
      val (gAe, sharedE) = est(pair)
      // per-sketch stderr ~1.6% at lgK 12; inventory estimate: 5 sigma
      assert(math.abs(gAe - gA).toDouble <= 0.08 * gA + 2, s"$pair grams_a: $gAe vs $gA")
      // inclusion-exclusion compounds THREE estimates; band scales with
      // the larger inventory, not the overlap
      val bound = 0.08 * math.max(est(pair)._1, exact(pair)._1).toDouble + 10
      assert(math.abs(sharedE - shared).toDouble <= bound, s"$pair shared: $sharedE vs $shared")
    }
    // the ranking signal survives sketching: A-B overlap >> A-C overlap
    assert(est(("A", "B"))._2 > 10L * (est(("A", "C"))._2 + 1))
  }
}
