package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over `array<float>` columns.
  *
  * Built on `zip_with`/`aggregate` higher-order expressions: per-row,
  * codegen'd, no UDF, no shuffle. Accumulation is sequential left-to-right
  * in double precision, so results are bit-deterministic across runs and
  * partitionings — a requirement for hash-compared oracles and idempotent
  * dedup at scale.
  */
object vectors {

  /** Σ aᵢ·bᵢ in double precision — the native codegen'd
    * [[graft.expressions.DotProductExpr]] (same left-to-right double
    * accumulation as the higher-order fold it replaced, ~dim× fewer
    * interpreted lambda frames per row).
    */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      graft.expressions.DotProductExpr(
        ColumnBridge.eagerExpression(a),
        ColumnBridge.eagerExpression(b)))
  }

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0.0 when either side has zero norm. Clamped to the
    * mathematical range [-1, 1]: d/(|a||b|) can land 1 ulp outside it for
    * (near-)identical vectors, and downstream max-aggregation over pair
    * paths must not prefer a 1.0000000000000002 rounding artifact over the
    * exact 1.0 the identical-content path reports.
    */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = norm(a) * norm(b)
    when(n === 0.0, lit(0.0))
      .otherwise(least(lit(1.0), greatest(lit(-1.0), d / n)))
  }

  /** Squared L2 distance (cheaper than sqrt for nearest-neighbor ranking). */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val dxy = x.cast("double") - y.cast("double")
        dxy * dxy
      }),
      lit(0.0),
      (acc, v) => acc + v)

  /** Sign-bit signature against a fixed set of hyperplanes (random-
    * hyperplane LSH): bit p set ⇔ dot(v, planes(p)) > 0. Packed into a
    * long (max 64 planes). Planes are driver-side constants baked into the
    * plan as literals — broadcast for free with the task binary.
    */
  def lshSignature(v: Column, planes: Array[Array[Double]]): Column = {
    require(planes.length <= 64, "at most 64 hyperplanes per signature")
    planes.zipWithIndex
      .map { case (plane, p) =>
        val planeCol = array(plane.map(lit(_)): _*)
        when(dot(v, planeCol) > 0.0, lit(1L << p)).otherwise(lit(0L))
      }
      .reduce(_ + _)
  }

  /** Deterministic pseudo-random unit-ish hyperplanes (seeded). */
  def randomPlanes(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }
}
