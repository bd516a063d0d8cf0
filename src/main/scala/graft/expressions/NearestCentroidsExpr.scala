package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native IVF cell assignment: the `nprobe` nearest coarse centroids of a
  * vector, by squared L2, ascending (element 0 = the cell the vector
  * belongs to). Centroids are driver-trained constants baked into the
  * expression — they ship with the task binary, broadcast for free.
  *
  * Why an Expression: the composed form materializes an `nlist`-element
  * array of (distance, cell) structs PER ROW and sorts all of it to take
  * the first `nprobe` — interpreted higher-order functions, O(nlist)
  * allocations, O(nlist log nlist) sort. Production IVF runs nlist in the
  * thousands (4k–64k cells for billion-row corpora), where that per-row
  * cost dominates the scan. This expression is one tight primitive loop —
  * distances computed in place, a bounded `nprobe`-slot insertion keeps
  * the running nearest — with no allocation beyond the output array, in
  * both interpreted eval and generated Java.
  *
  * Ties on distance keep the LOWER cell index, and NaN distances rank as
  * +infinity (selection is lexicographic on (distance, cell)) — so even a
  * corrupt all-NaN vector yields nprobe DISTINCT cells, the same order
  * the composed `array_sort` on (d, cell) structs produced. Vector
  * elements must be non-null (embeddings carry no nulls); a shorter
  * vector scores over its prefix, matching the `zip_with` fold it
  * replaces. A NULL vector yields NULL.
  *
  * `centroidsFlat` is row-major (`nlist × dim`) and an IndexedSeq, not an
  * Array, so two expressions over the same trained centroids are
  * case-class-equal — plan canonicalization and cached-plan matching see
  * through to the values.
  */
case class NearestCentroidsExpr(
    child: Expression,
    centroidsFlat: IndexedSeq[Double],
    dim: Int,
    nprobe: Int) extends UnaryExpression {

  require(dim > 0, "dim must be positive")
  require(centroidsFlat.nonEmpty && centroidsFlat.length % dim == 0,
    "centroidsFlat must hold nlist x dim doubles")
  private val nlist: Int = centroidsFlat.length / dim
  require(nprobe >= 1 && nprobe <= nlist, "nprobe must be in [1, nlist]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_nearest_cells requires array<float|double>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_nearest_cells"

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  @transient private lazy val flat: Array[Double] = centroidsFlat.toArray

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = math.min(arr.numElements(), dim)
    // Selection is lexicographic on (distance, cell) with NaN ranked as
    // +infinity: a corrupt (NaN/Inf) vector still yields nprobe DISTINCT
    // cells (0..nprobe-1), matching the composed array_sort form — a
    // plain `d < best` comparison would never admit NaN and return
    // nprobe copies of cell 0, silently probing one cell.
    val bestD = Array.fill(nprobe)(Double.PositiveInfinity)
    val bestC = Array.fill(nprobe)(Int.MaxValue)
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
      if (d != d) d = Double.PositiveInfinity
      val last = nprobe - 1
      if (d < bestD(last) || (d == bestD(last) && c < bestC(last))) {
        var p = last
        while (p > 0 && (bestD(p - 1) > d || (bestD(p - 1) == d && bestC(p - 1) > c))) {
          bestD(p) = bestD(p - 1); bestC(p) = bestC(p - 1); p -= 1
        }
        bestD(p) = d; bestC(p) = c
      }
      c += 1
    }
    UnsafeArrayData.fromPrimitiveArray(bestC)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("graftCentroids", flat, "double[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val getter = if (isFloat) s"(double) $arr.getFloat" else s"$arr.getDouble"
      val m = ctx.freshName("m")
      val bestD = ctx.freshName("bestD")
      val bestC = ctx.freshName("bestC")
      val c = ctx.freshName("c")
      val base = ctx.freshName("base")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val p = ctx.freshName("p")
      s"""
         |int $m = Math.min($arr.numElements(), $dim);
         |double[] $bestD = new double[$nprobe];
         |int[] $bestC = new int[$nprobe];
         |java.util.Arrays.fill($bestD, Double.POSITIVE_INFINITY);
         |java.util.Arrays.fill($bestC, Integer.MAX_VALUE);
         |for (int $c = 0; $c < $nlist; $c++) {
         |  int $base = $c * $dim;
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $m; $i++) {
         |    double $x = $getter($i) - $flatRef[$base + $i];
         |    $d += $x * $x;
         |  }
         |  if (Double.isNaN($d)) $d = Double.POSITIVE_INFINITY;
         |  if ($d < $bestD[$nprobe - 1] ||
         |      ($d == $bestD[$nprobe - 1] && $c < $bestC[$nprobe - 1])) {
         |    int $p = $nprobe - 1;
         |    while ($p > 0 && ($bestD[$p - 1] > $d ||
         |        ($bestD[$p - 1] == $d && $bestC[$p - 1] > $c))) {
         |      $bestD[$p] = $bestD[$p - 1]; $bestC[$p] = $bestC[$p - 1]; $p--;
         |    }
         |    $bestD[$p] = $d; $bestC[$p] = $c;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($bestC);
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidsExpr =
    copy(child = newChild)
}
