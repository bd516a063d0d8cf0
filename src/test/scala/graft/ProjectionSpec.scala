package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Projection

/** Deterministic JL projection: exact equality with an in-memory
  * reference (linear sign family), determinism/invariance of the xxhash
  * family, null/plan behavior, and the distance-preservation property
  * the projection exists for.
  */
class ProjectionSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val seed = 7L

  private def refSign(i: Long, j: Long): Long =
    if ((Projection.LinearA * i + Projection.LinearB * j + seed) % Projection.LinearP * 2
      < Projection.LinearP) 1L else -1L

  private def refProject(vec: Seq[Float], k: Int): Seq[Long] =
    (0 until k).map { i =>
      vec.indices.map(j =>
        refSign(i.toLong, j.toLong) * math.floor(vec(j).toDouble * 1e6).toLong).sum
    }

  private val rng = new scala.util.Random(42)
  private def randVec(d: Int): Seq[Float] =
    Seq.fill(d)((rng.nextGaussian() / math.sqrt(d.toDouble)).toFloat)
  private val vecs = (0 until 40).map(i => (i.toLong, randVec(64)))
  private def vecDf = vecs.toDF("vec_id", "embedding")

  test("linear-sign projection equals the in-memory reference exactly") {
    val got = Projection.project(vecDf, "embedding", 8, Projection.linearSign(seed))
      .select("vec_id", "proj").as[(Long, Seq[Long])].collect().toMap
    val want = vecs.map { case (id, v) => id -> refProject(v, 8) }.toMap
    assert(got === want)
  }

  test("xxhash-sign projection is deterministic and partitioning-invariant") {
    val a = Projection.project(vecDf, "embedding", 8, Projection.xxhashSign(seed))
      .select("vec_id", "proj").as[(Long, Seq[Long])].collect().toMap
    val b = Projection.project(vecDf.repartition(7), "embedding", 8, Projection.xxhashSign(seed))
      .select("vec_id", "proj").as[(Long, Seq[Long])].collect().toMap
    assert(a === b)
    // a different seed is a different matrix
    val c = Projection.project(vecDf, "embedding", 8, Projection.xxhashSign(seed + 1))
      .select("vec_id", "proj").as[(Long, Seq[Long])].collect().toMap
    assert(a !== c)
  }

  test("null vectors project to null; plan has no exchange") {
    val d = Seq((1L, Seq(0.5f, -0.5f)), (2L, null.asInstanceOf[Seq[Float]]))
      .toDF("vec_id", "embedding")
    val out = Projection.project(d, "embedding", 4, Projection.xxhashSign(seed))
      .select("vec_id", "proj").collect()
      .map(r => r.getLong(0) -> Option(r.getSeq[Long](1))).toMap
    assert(out(1L).isDefined && out(1L).get.size === 4)
    assert(out(2L).isEmpty)
    // empty (non-null) vector: all-zero projection, not a crash
    val e = Seq((3L, Seq.empty[Float])).toDF("vec_id", "embedding")
    val ep = Projection.project(e, "embedding", 4, Projection.xxhashSign(seed))
      .select("proj").as[Seq[Long]].head()
    assert(ep === Seq(0L, 0L, 0L, 0L))
    val plan = Projection.project(vecDf, "embedding", 8, Projection.xxhashSign(seed))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection must not shuffle:\n$plan")
  }

  test("JL property: cosines survive 64 → 48 and a planted near-dup stays near") {
    // 40 random vectors plus a planted near-duplicate of vector 0
    val planted = vecs :+ (99L, vecs.head._2.map(v => v + rng.nextGaussian().toFloat * 0.02f))
    val df = planted.toDF("vec_id", "embedding")
    val k = 48
    val projected = Projection.descale(
      Projection.project(df, "embedding", k, Projection.xxhashSign(seed)), k)
      .select("vec_id", "proj").as[(Long, Seq[Double])].collect().toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val orig = planted.toMap.view.mapValues(_.map(_.toDouble)).toMap
    val pairs = for (i <- 0L until 40L; j <- (i + 1) until 40L if (i + j) % 7 == 0) yield (i, j)
    val errs = pairs.map { case (i, j) =>
      math.abs(cos(orig(i), orig(j)) - cos(projected(i), projected(j)))
    }
    // ε ≈ √(ln n / k) ≈ 0.28 here; the bounds are the loose statistical
    // envelope of that, stable because everything is seed-deterministic
    assert(errs.max < 0.6, s"worst-case cosine drift too large: ${errs.max}")
    assert(errs.sum / errs.size < 0.2, s"mean cosine drift too large: ${errs.sum / errs.size}")
    // the property ANN actually needs: a true near-dup remains one
    assert(cos(orig(0L), orig(99L)) > 0.95)
    assert(cos(projected(0L), projected(99L)) > 0.8,
      s"planted near-dup drifted apart: ${cos(projected(0L), projected(99L))}")
  }

  test("composition: ANN over projected vectors finds the planted near-dup") {
    val planted = vecs :+ (99L, vecs.head._2.map(v => v + rng.nextGaussian().toFloat * 0.01f))
    val df = planted.toDF("vec_id", "embedding")
    val k = 16
    val projected = Projection.descale(
      Projection.project(df, "embedding", k, Projection.xxhashSign(seed)), k)
      .select(col("vec_id"),
        transform(col("proj"), y => y.cast("float")).as("pvec"))
    val top = graft.operators.Similarity
      .bruteForceTopK(projected, "vec_id", "pvec", queryId = 99L, k = 1)
      .select("vec_id").as[Long].head()
    assert(top === 0L, "nearest neighbor in projected space must be the source vector")
    graft.operators.Caches.release()
  }

  test("descale applies the 1/(10^6 · sqrt(k)) JL normalizer") {
    val d = Seq((1L, Seq(1.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val raw = Projection.project(d, "embedding", 4, Projection.linearSign(seed))
      .select("proj").as[Seq[Long]].head()
    val scaled = Projection.descale(
      Projection.project(d, "embedding", 4, Projection.linearSign(seed)), 4)
      .select("proj").as[Seq[Double]].head()
    assert(scaled === raw.map(_.toDouble / (1e6 * 2.0)))
  }
}
