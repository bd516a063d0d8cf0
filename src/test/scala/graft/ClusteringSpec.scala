package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Clustering

class ClusteringSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  /** Independent single-threaded mirror of the integer Lloyd recurrence. */
  private def reference(
      vecs: Seq[(Long, Array[Float])],
      k: Int,
      iters: Int,
      scale: Int): (IndexedSeq[Array[Long]], Map[Long, (Int, Long)]) = {
    def quant(v: Array[Float]): Array[Long] =
      v.map(x => math.floor(x.toDouble * scale + 0.5).toLong)
    val q = vecs.map { case (id, v) => id -> quant(v) }
    var cents: IndexedSeq[Array[Long]] =
      q.sortBy(_._1).take(k).map(_._2).toIndexedSeq
    def nearest(v: Array[Long]): (Int, Long) =
      cents.indices.map(c => {
        val d = v.zip(cents(c)).map { case (a, b) => (a - b) * (a - b) }.sum
        (d, c)
      }).min match { case (d, c) => (c, d) }
    for (_ <- 1 to iters) {
      val byC = q.groupBy { case (_, v) => nearest(v)._1 }
      cents = cents.indices.map { c =>
        byC.get(c).fold(cents(c)) { members =>
          val n = members.size.toLong
          val dims = cents(c).length
          Array.tabulate(dims)(j => members.map(_._2(j)).sum / n)
        }
      }
    }
    (cents, q.map { case (id, v) => id -> nearest(v) }.toMap)
  }

  private def blobs(n: Int, seed: Int): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    (0L until n.toLong).map { i =>
      val center = (i % 4) * 2.0f - 3.0f
      i -> Array.fill(8)(center + rnd.nextFloat() * 0.6f - 0.3f)
    }
  }

  test("kmeansInt matches the single-threaded integer recurrence (centroids, labels, distances)") {
    val data = blobs(120, seed = 5)
    val df = data.toDF("vec_id", "embedding")
    val (refCents, refAssign) = reference(data, k = 4, iters = 3, scale = 1000)
    val gotCents = Clustering.trainKmeansInt(df, "vec_id", "embedding", k = 4, iters = 3)
    assert(gotCents.map(_.toSeq) === refCents.map(_.toSeq))
    val got = Clustering.kmeansInt(df, "vec_id", "embedding", k = 4, iters = 3)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(got === refAssign)
    assert(got.values.map(_._1).toSet.size > 1, "the blobs must actually separate")
  }

  test("training is invariant to physical layout (exact integer rounds)") {
    val data = blobs(200, seed = 11)
    def run(parts: Int) = Clustering.trainKmeansInt(
      data.toDF("vec_id", "embedding").repartition(parts),
      "vec_id", "embedding", k = 5, iters = 4).map(_.toSeq)
    assert(run(1) === run(17))
  }

  test("a cluster that loses all members keeps its previous centroid") {
    // seeds 0 and 1 are IDENTICAL vectors: every point (including seed
    // 1's own) ties at equal distance and the tie rule sends it to the
    // LOWER index, so cluster 1 is empty from round 1 and its centroid
    // must stay frozen at the quantized seed
    val vecs = Seq(
      0L -> Array(1.0f, 1.0f),
      1L -> Array(1.0f, 1.0f),
      2L -> Array(1.2f, 1.0f),
      3L -> Array(0.9f, 1.1f))
    val df = vecs.toDF("vec_id", "embedding")
    val round1 = Clustering.trainKmeansInt(df, "vec_id", "embedding", k = 2, iters = 1)
    assert(round1(1).toSeq === Seq(1000L, 1000L), "the vacated cluster's centroid must not move")
    assert(round1(0).toSeq === Seq(1025L, 1025L), "cluster 0 absorbs every tied point")
    // later rounds REPOPULATE cluster 1 (centroid 0 drifted away) — the
    // engine must track the reference through the empty-then-refilled arc
    val got = Clustering.trainKmeansInt(df, "vec_id", "embedding", k = 2, iters = 3)
    val (refCents, _) = reference(vecs, k = 2, iters = 3, scale = 1000)
    assert(got.map(_.toSeq) === refCents.map(_.toSeq))
    assert(got(1).toSeq === Seq(966L, 1033L), "round 2+ refills the vacated cluster")
  }

  test("a NULL embedding fails loudly with the cause named, not an NPE") {
    val docs = (blobs(20, seed = 2) :+ (99L -> null.asInstanceOf[Array[Float]]))
      .toDF("vec_id", "embedding")
    val ex = intercept[IllegalArgumentException] {
      Clustering.trainKmeansInt(docs, "vec_id", "embedding", k = 2, iters = 2)
    }
    assert(ex.getMessage.contains("NULL embedding"), ex.getMessage)
  }

  test("train consumes its own pin; nothing stays persisted") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Clustering.trainKmeansInt(
      blobs(50, seed = 3).toDF("vec_id", "embedding"), "vec_id", "embedding", k = 2, iters = 2)
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).isEmpty)
  }

  test("assignment plan: no shuffle, no join — centroid constants ride the projection") {
    val df = blobs(60, seed = 9).toDF("vec_id", "embedding")
    val cents = Clustering.trainKmeansInt(df, "vec_id", "embedding", k = 3, iters = 2)
    val out = Clustering.assignKmeansInt(df, "vec_id", "embedding", cents)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assignment must not shuffle:\n$plan")
    assert(!plan.contains("Join"), s"assignment must not join:\n$plan")
  }
}
