package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Distributed full-corpus Lloyd training vs a single-threaded reference
  * on INTEGER-VALUED vectors — exact FP addition makes the comparison
  * bit-for-bit regardless of partition/reduction order, so this pins the
  * algorithm, not a tolerance.
  */
class KmeansSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  /** Deterministic integer-valued corpus: three planted blobs + noise. */
  private def corpus(n: Int): Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(99)
    (1 to n).map { i =>
      val center = i % 3 match {
        case 0 => Array(0f, 0f, 0f, 0f)
        case 1 => Array(100f, 100f, 0f, 0f)
        case 2 => Array(0f, 0f, 100f, 100f)
      }
      (i.toLong, center.map(c => c + rnd.nextInt(5).toFloat).toSeq)
    }
  }

  /** Reference Lloyd with the SAME seeding contract as trainIvfFull. */
  private def referenceTrain(
      rows: Seq[(Long, Seq[Float])],
      nlist: Int,
      iters: Int): Array[Array[Double]] = {
    val hashed = rows
      .map { case (id, v) => (id, v.map(_.toDouble).toArray) }
    // xxhash64 order: reproduce by collecting through Spark (the hash is
    // engine-defined), then iterate single-threaded
    val order = rows.toDF("id", "vec").orderBy(xxhash64(col("id")))
      .select("id").as[Long].collect()
    val byId = hashed.toMap
    val seeds = order.take(4 * nlist).map(byId)
      .distinctBy(_.toSeq).take(nlist)
    var centroids: Array[Array[Double]] = seeds
    val dim = centroids.head.length
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    for (_ <- 0 until iters) {
      val sums = Array.fill(centroids.length)(new Array[Double](dim))
      val counts = new Array[Long](centroids.length)
      hashed.foreach { case (_, p) =>
        var best = 0; var bestD = Double.MaxValue; var c = 0
        while (c < centroids.length) {
          val d = d2(p, centroids(c)); if (d < bestD) { bestD = d; best = c }; c += 1
        }
        counts(best) += 1
        var i = 0; while (i < dim) { sums(best)(i) += p(i); i += 1 }
      }
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old else sums(c).map(_ / counts(c))
      }
    }
    centroids
  }

  test("trainIvfFull equals the single-threaded reference bit-for-bit on integer vectors") {
    val rows = corpus(300)
    val emb = rows.toDF("vec_id", "embedding").repartition(7)
    val got = Similarity.trainIvfFull(emb, "vec_id", "embedding", nlist = 3, iters = 4)
    val want = referenceTrain(rows, nlist = 3, iters = 4)
    assert(got.centroids.map(_.toSeq).toSeq === want.map(_.toSeq).toSeq)
  }

  test("trainIvfFull centroids land on the planted blob means (clustering sanity)") {
    val rows = corpus(300)
    val emb = rows.toDF("vec_id", "embedding")
    val got = Similarity.trainIvfFull(emb, "vec_id", "embedding", nlist = 3, iters = 6)
    val blobCenters = Seq(
      Seq(2.0, 2.0, 2.0, 2.0), Seq(102.0, 102.0, 2.0, 2.0), Seq(2.0, 2.0, 102.0, 102.0))
    blobCenters.foreach { c =>
      val nearest = got.centroids.map(k =>
        k.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum).min
      assert(nearest < 25.0, s"no trained centroid near blob $c: ${got.centroids.map(_.toSeq).toSeq}")
    }
  }

  test("the per-iteration aggregation is one nlist-keyed exchange (nothing dimensional explodes)") {
    import org.apache.spark.sql.graft.ColumnBridge
    val emb = corpus(50).toDF("vec_id", "embedding")
    val sumCol = ColumnBridge.column(
      graft.expressions.VectorSumAgg(ColumnBridge.eagerExpression(col("embedding")))
        .toAggregateExpression())
    val plan = emb.groupBy(lit(0).as("cell")).agg(sumCol.as("s"))
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("explode") && !plan.toLowerCase.contains("generate"),
      s"vector sums must not explode dimensions:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 1, plan)
  }

  test("graft_vec_sum SQL surface and dimension-mismatch loudness") {
    graft.expressions.GraftFunctions.register(spark)
    Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(3.0f, 4.0f))).toDF("id", "v")
      .createOrReplaceTempView("vecs")
    val r = spark.sql("SELECT graft_vec_sum(v) AS s FROM vecs").head()
    val s = r.getStruct(0)
    assert(s.getAs[Long]("cnt") === 2L)
    assert(s.getSeq[Double](s.fieldIndex("sums")) === Seq(4.0, 6.0))
    val bad = Seq(Seq(1.0f), Seq(1.0f, 2.0f)).toDF("v")
    intercept[Exception] {
      bad.agg(expr("graft_vec_sum(v)")).collect()
    }
  }
}
