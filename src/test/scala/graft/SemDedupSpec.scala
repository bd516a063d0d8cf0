package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{SemDedup, Similarity}
import graft.sources.Tables

/** Gates the approximate SemDeDup face against its exact twin — the spec
  * the q89 catalog entry's correctness posture names:
  *
  *  - PRECISION 1 (subset law): cluster blocking can only MISS pairs
  *    (both members must land in the same cell), never invent them —
  *    every emitted pair is verified by true cosine. So q89's dropped
  *    set ⊆ q89c's dropped set, equivalently kept(q89) ⊇ kept(q89c).
  *  - PLANTED RECALL: each vec_id % 10 == 0 row has a × 1.001f scaled
  *    copy at vec_id + 1000000. Scaling preserves direction, so the copy
  *    has cosine ≈ 1.0 to its source and — because nearest-centroid
  *    assignment of a positively scaled vector under squared-L2 can
  *    differ near a cell boundary — recall is asserted on the PLANTED
  *    set, where the corpus construction gives a ~0.01 cosine margin.
  */
class SemDedupSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._
  private val sfDir = "/root/testdata/sf0.001"

  private def plantedCorpus = {
    val emb = Tables.load(spark, sfDir, "embeddings").select("vec_id", "embedding")
    val perturbed = emb
      .where(col("vec_id") % 10 === 0)
      .select(
        (col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), x => (x * lit(1.001f)).cast("float")).as("embedding"))
    emb.unionByName(perturbed)
  }

  test("q89 catalog face: dropped ⊆ exact-twin dropped, every planted copy dropped") {
    val corpus = plantedCorpus.cache()
    try {
      val allIds = corpus.select("vec_id").as[Long].collect().toSet
      val keptApprox = Queries.q89SemanticDedup.fn(spark, sfDir)
        .select("vec_id").as[Long].collect().toSet
      val keptExact = Queries.q89cSemanticDedupExact.fn(spark, sfDir)
        .select("vec_id").as[Long].collect().toSet
      val droppedApprox = allIds.diff(keptApprox)
      val droppedExact = allIds.diff(keptExact)
      assert(droppedApprox.subsetOf(droppedExact),
        s"precision-1 violated: approx dropped ${droppedApprox.diff(droppedExact)} " +
          "that the exact twin keeps")
      val planted = allIds.filter(_ >= 1000000L)
      assert(planted.nonEmpty, "corpus must contain planted copies")
      assert(planted.subsetOf(droppedApprox),
        s"planted recall violated: kept planted copies ${planted.diff(droppedApprox)}")
    } finally corpus.unpersist()
  }

  test("subset law holds under a finite maxCell (the hot-cell linear path)") {
    val corpus = plantedCorpus.cache()
    try {
      val index = Similarity.trainIvfFull(corpus, "vec_id", "embedding", nlist = 2, iters = 2)
      // nlist=2 over ~1000 vectors with maxCell=64 forces both cells hot
      val keptHot = SemDedup.semanticDedup(
        corpus, "vec_id", "embedding", index, threshold = 0.99, maxCell = 64)
        .select("vec_id").as[Long].collect().toSet
      val keptExact = SemDedup.exactKeptIds(corpus, "vec_id", "embedding", threshold = 0.99)
        .as[Long].collect().toSet
      assert(keptHot.size >= keptExact.size,
        "capped blocking may only MISS drops, never add them")
      assert(keptExact.subsetOf(keptHot),
        "every row the exact form keeps must survive the capped approximate form")
    } finally corpus.unpersist()
  }

  test("duplicated zero vectors are kept by both faces (cosine undefined → 0.0)") {
    val dim = 8
    val zero = Array.fill(dim)(0.0f).toSeq
    val unit = (Array.fill(dim - 1)(0.0f) :+ 1.0f).toSeq
    val rows = Seq(
      (1L, zero), (2L, zero), (3L, zero), // identical zero vectors
      (10L, unit), (11L, unit.map(x => x * 2.0f))) // a real near-dup pair
    val emb = rows.toDF("vec_id", "embedding")
    val index = Similarity.IvfIndex(Array(Array.fill(dim)(0.0), Array.fill(dim - 1)(0.0) :+ 1.0))
    // maxCell=1 forces EVERY cell through the hot star path — the edge
    // where zero vectors used to pair at 1.0 and break the subset law
    val keptHot = SemDedup.semanticDedup(
      emb, "vec_id", "embedding", index, threshold = 0.99, maxCell = 1)
      .select("vec_id").as[Long].collect().toSet
    val keptExact = SemDedup.exactKeptIds(emb, "vec_id", "embedding", threshold = 0.99)
      .as[Long].collect().toSet
    assert(Set(1L, 2L, 3L).subsetOf(keptExact), "exact: zero-norm cosine is 0.0, never a pair")
    assert(Set(1L, 2L, 3L).subsetOf(keptHot), "hot star path must not pair zero vectors")
    assert(keptExact.subsetOf(keptHot))
    assert(!keptExact.contains(11L), "the scaled unit copy is a true drop")
  }
}
