package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Inverted multi-index cell assignment (Babenko & Lempitsky, CVPR 2012:
  * "The Inverted Multi-Index") — the two-level coarse quantizer that
  * removes the single-level scale ceiling. The cell grid is the CARTESIAN
  * PRODUCT of two independent half-space quantizers: a vector splits into
  * halves (v₁, v₂), each half gets its nearest-of-k centroids, and the
  * combined cell id is `c₁ · k₂ + c₂`. Because squared L2 to a product
  * centroid decomposes exactly — d²(v, (c₁,c₂)) = d²(v₁,c₁) + d²(v₂,c₂) —
  * ranking cells by half-distance SUM is ranking them by true distance to
  * the product-centroid set: the assignment is exact nearest-of-grid, not
  * an approximation of it ([[graft.ImiSpec]] pins bitwise equality with
  * [[NearestCentroidsExpr]] over the expanded product table on
  * integer-valued vectors).
  *
  * Why this beats one flat quantizer at large nlist (the round-15 VERDICT
  * ceiling): for `nlist = k²` cells, the flat form bakes `k² · dim`
  * doubles into every task binary (~400 MB at 2¹⁶ cells × 768 dims) and
  * pays `k² · dim` multiply-adds per row; the product form ships
  * `(k₁ + k₂) · dim/2` doubles (~1.5 MB for the same 2¹⁶ cells) and pays
  * `(k₁ + k₂) · dim/2` multiply-adds plus `k₁ · k₂` ADDITIONS (the sum
  * grid) — both ~dim× lighter. The selection over the sum grid reuses
  * [[NearestCentroidsExpr]]'s bounded nprobe-slot insertion in cell-id
  * order, so tie-breaking (lower cell id) and NaN handling (rank as
  * +infinity; a corrupt vector still yields nprobe distinct cells) are
  * IDENTICAL to the single-level expression by construction.
  *
  * FP caveat: the flat form accumulates d² across all `dim` terms in one
  * run; the product form sums two half-accumulations. On real-valued
  * vectors the two can differ in the last ulp (associativity), which can
  * flip exact distance TIES only; on integer-valued vectors (every spec
  * and gate fixture) both are exact. The index artifact contract absorbs
  * the rest: probes replay saved centroids, not the training run.
  */
private[graft] object ImiKernels {

  /** The `nprobe` nearest product cells of `v` (first `n` elements
    * valid — the [[NearestCentroidsExpr]] prefix contract: a shorter
    * vector scores over the prefix it has, missing dims contribute
    * nothing). The two halves may have DIFFERENT widths (`dim1`,
    * `dim2`) — d² decomposes over any partition of the dimensions, so
    * odd-dimension corpora split ceil/floor and lose nothing. Returns
    * combined cell ids `c₁ · k₂ + c₂`, ascending by (distance, cell
    * id), NaN distance ranked +infinity.
    */
  def nearestCells(
      v: Array[Double],
      n: Int,
      flat1: Array[Double],
      flat2: Array[Double],
      dim1: Int,
      dim2: Int,
      k1: Int,
      k2: Int,
      nprobe: Int): Array[Int] = {
    val d1 = halfDistances(v, 0, math.min(n, dim1), flat1, dim1, k1)
    val d2 = halfDistances(v, dim1, math.max(0, math.min(n, dim1 + dim2) - dim1),
      flat2, dim2, k2)
    val bestD = new Array[Double](nprobe)
    val bestC = new Array[Int](nprobe)
    java.util.Arrays.fill(bestD, Double.PositiveInfinity)
    java.util.Arrays.fill(bestC, Int.MaxValue)
    var c1 = 0
    while (c1 < k1) {
      val a = d1(c1)
      var c2 = 0
      while (c2 < k2) {
        var d = a + d2(c2)
        if (d != d) d = Double.PositiveInfinity
        val c = c1 * k2 + c2
        val last = nprobe - 1
        if (d < bestD(last) || (d == bestD(last) && c < bestC(last))) {
          var p = last
          while (p > 0 && (bestD(p - 1) > d || (bestD(p - 1) == d && bestC(p - 1) > c))) {
            bestD(p) = bestD(p - 1); bestC(p) = bestC(p - 1); p -= 1
          }
          bestD(p) = d; bestC(p) = c
        }
        c2 += 1
      }
      c1 += 1
    }
    bestC
  }

  /** d²(v[off .. off+m), centroid) for each of the `k` centroids of one
    * half-space quantizer (`flat` row-major k × dimHalf).
    */
  private def halfDistances(
      v: Array[Double],
      off: Int,
      m: Int,
      flat: Array[Double],
      dimHalf: Int,
      k: Int): Array[Double] = {
    val out = new Array[Double](k)
    var c = 0
    while (c < k) {
      val base = c * dimHalf
      var d = 0.0
      var i = 0
      while (i < m) {
        val x = v(off + i) - flat(base + i)
        d += x * x
        i += 1
      }
      out(c) = d
      c += 1
    }
    out
  }
}

/** vector (array<float|double>) → its `nprobe` nearest IMI product cells
  * (array<int>, combined ids `c₁ · k₂ + c₂`, ascending by distance, ties
  * to the lower id) — the two-level twin of [[NearestCentroidsExpr]],
  * with both half-quantizers baked in as plan constants (the whole point:
  * (k₁+k₂) · dim/2 doubles instead of k₁·k₂·dim). Semantics (prefix
  * scoring, NaN→+infinity, null vector → NULL, non-null elements
  * assumed) are the single-level expression's, verbatim.
  */
case class NearestImiCellsExpr(
    child: Expression,
    flat1: IndexedSeq[Double],
    flat2: IndexedSeq[Double],
    dim1: Int,
    dim2: Int,
    nprobe: Int) extends UnaryExpression {

  require(dim1 > 0 && dim2 > 0, "half dims must be positive")
  require(flat1.nonEmpty && flat1.length % dim1 == 0,
    "flat1 must hold k1 x dim1 doubles")
  require(flat2.nonEmpty && flat2.length % dim2 == 0,
    "flat2 must hold k2 x dim2 doubles")
  private val k1: Int = flat1.length / dim1
  private val k2: Int = flat2.length / dim2
  require(k1.toLong * k2 <= Int.MaxValue, "k1 * k2 must fit an int cell id")
  private val nlist: Int = k1 * k2
  require(nprobe >= 1 && nprobe <= nlist, "nprobe must be in [1, k1*k2]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_nearest_imi_cells requires array<float|double>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_nearest_imi_cells"

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  @transient private lazy val f1: Array[Double] = flat1.toArray
  @transient private lazy val f2: Array[Double] = flat2.toArray

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), dim1 + dim2)
    val vec = new Array[Double](dim1 + dim2)
    var i = 0
    while (i < n) {
      vec(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      ImiKernels.nearestCells(vec, n, f1, f2, dim1, dim2, k1, k2, nprobe))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f1Ref = ctx.addReferenceObj("graftImiFlat1", f1, "double[]")
    val f2Ref = ctx.addReferenceObj("graftImiFlat2", f2, "double[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val get = if (isFloat) "getFloat" else "getDouble"
      val vec = ctx.freshName("vec")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($arr.numElements(), ${dim1 + dim2});
         |double[] $vec = new double[${dim1 + dim2}];
         |for (int $i = 0; $i < $n; $i++) {
         |  $vec[$i] = (double) $arr.$get($i);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
         |  graft.expressions.ImiKernels.nearestCells($vec, $n, $f1Ref, $f2Ref, $dim1, $dim2, $k1, $k2, $nprobe));
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestImiCellsExpr =
    copy(child = newChild)
}
