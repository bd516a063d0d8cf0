package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Minimum squared L2 distance from a vector to a fixed centroid set —
  * the per-row quantity k-means|| seeding samples on (each round keeps a
  * row with probability ∝ its distance to the candidates chosen so far;
  * see [[graft.operators.Similarity.seedKMeansPar]], Bahmani et al.,
  * VLDB 2012 §3). The sibling of [[NearestCentroidsExpr]]: same baked-in
  * row-major centroid constant, same tight primitive loop in interpreted
  * eval and generated Java, but it returns the DISTANCE, which the cell
  * assignment deliberately discards — composing "assign, then re-derive
  * the distance to the assigned centroid" would pay the nlist scan twice
  * or materialize per-row structs.
  *
  * NaN element distances rank as +infinity per centroid; a vector whose
  * distance to EVERY centroid is NaN yields +infinity. Note the seeding
  * implication: a corrupt vector's distance TO ITSELF is NaN, never 0, so
  * it would dominate the sampling potential on every round forever —
  * which is why [[graft.operators.Similarity.seedKMeansPar]] quarantines
  * non-finite vectors before this expression ever sees one. A shorter
  * vector scores over its prefix and a NULL vector yields NULL, matching
  * [[NearestCentroidsExpr]]'s conventions.
  *
  * `centroidsFlat` is an IndexedSeq so equal centroid sets make
  * case-class-equal expressions (plan canonicalization sees the values).
  */
case class MinSqDistExpr(
    child: Expression,
    centroidsFlat: IndexedSeq[Double],
    dim: Int) extends UnaryExpression {

  require(dim > 0, "dim must be positive")
  require(centroidsFlat.nonEmpty && centroidsFlat.length % dim == 0,
    "centroidsFlat must hold nlist x dim doubles")
  private val nlist: Int = centroidsFlat.length / dim

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_min_sq_dist requires array<float|double>, got ${other.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_min_sq_dist"

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  @transient private lazy val flat: Array[Double] = centroidsFlat.toArray

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = math.min(arr.numElements(), dim)
    var best = Double.PositiveInfinity
    var c = 0
    while (c < nlist) {
      val base = c * dim
      var d = 0.0
      var i = 0
      while (i < m) {
        val x = (if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)) - flat(base + i)
        d += x * x
        i += 1
      }
      if (d == d && d < best) best = d
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("graftCentroids", flat, "double[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val getter = if (isFloat) s"(double) $arr.getFloat" else s"$arr.getDouble"
      val m = ctx.freshName("m")
      val best = ctx.freshName("best")
      val c = ctx.freshName("c")
      val base = ctx.freshName("base")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      s"""
         |int $m = Math.min($arr.numElements(), $dim);
         |double $best = Double.POSITIVE_INFINITY;
         |for (int $c = 0; $c < $nlist; $c++) {
         |  int $base = $c * $dim;
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $m; $i++) {
         |    double $x = $getter($i) - $flatRef[$base + $i];
         |    $d += $x * $x;
         |  }
         |  if (!Double.isNaN($d) && $d < $best) $best = $d;
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinSqDistExpr =
    copy(child = newChild)
}
