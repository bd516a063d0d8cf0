package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jégou, Douze & Schmid 2011: "Product
  * Quantization for Nearest Neighbor Search"). A vector of dimension
  * `m · dsub` is split into `m` subvectors; each subvector is replaced by
  * the id of its nearest sub-centroid out of `ksub` — the whole vector
  * becomes `m` bytes. Both kernels take the codebook as a flat
  * `double[m][ksub][dsub]` reference object (shipped once per plan, the
  * broadcast-relation mechanism), and run as one primitive loop in
  * interpreted eval and generated Java alike — the
  * [[DotProductExpr]] discipline.
  */
private[graft] object PqKernels {
  /** codebook(sub)(code)(d) flattened row-major. */
  @inline def centroidBase(sub: Int, code: Int, ksub: Int, dsub: Int): Int =
    (sub * ksub + code) * dsub

  def encode(v: Array[Double], flat: Array[Double], m: Int, ksub: Int, dsub: Int): Array[Byte] = {
    val out = new Array[Byte](m)
    var sub = 0
    while (sub < m) {
      var best = 0
      var bestD = Double.MaxValue
      var k = 0
      while (k < ksub) {
        val base = centroidBase(sub, k, ksub, dsub)
        var d2 = 0.0
        var i = 0
        while (i < dsub) {
          val d = v(sub * dsub + i) - flat(base + i)
          d2 += d * d
          i += 1
        }
        if (d2 < bestD) { bestD = d2; best = k }
        k += 1
      }
      out(sub) = (best & 0xFF).toByte
      sub += 1
    }
    out
  }

  /** Per-subspace partials summed at the end — the SAME accumulation
    * order as the LUT path (lut gather + sum), so [[PqAdcDotExpr]] and
    * the [[PqLutExpr]]/[[PqLutDotExpr]] pair are bit-identical, not just
    * close: callers can switch scoring paths without moving any
    * margin-threshold decision by an ulp.
    */
  def adcDot(q: Array[Double], code: Array[Byte], flat: Array[Double], m: Int, ksub: Int, dsub: Int): Double = {
    var acc = 0.0
    var sub = 0
    while (sub < m) {
      val base = centroidBase(sub, code(sub) & 0xFF, ksub, dsub)
      var subAcc = 0.0
      var i = 0
      while (i < dsub) {
        subAcc += q(sub * dsub + i) * flat(base + i)
        i += 1
      }
      acc += subAcc
      sub += 1
    }
    acc
  }

  /** The per-query ADC lookup table: lut(sub · ksub + k) = q_sub · c_sub_k.
    * O(dim · ksub) once per query; [[lutDot]] then scores each candidate
    * in O(m) gathers instead of O(dim) multiplies.
    */
  def lut(q: Array[Double], flat: Array[Double], m: Int, ksub: Int, dsub: Int): Array[Double] = {
    val out = new Array[Double](m * ksub)
    var sub = 0
    while (sub < m) {
      var k = 0
      while (k < ksub) {
        val base = centroidBase(sub, k, ksub, dsub)
        var acc = 0.0
        var i = 0
        while (i < dsub) {
          acc += q(sub * dsub + i) * flat(base + i)
          i += 1
        }
        out(sub * ksub + k) = acc
        k += 1
      }
      sub += 1
    }
    out
  }

  def lutDot(code: Array[Byte], lut: Array[Double], m: Int, ksub: Int): Double = {
    var acc = 0.0
    var sub = 0
    while (sub < m) {
      acc += lut(sub * ksub + (code(sub) & 0xFF))
      sub += 1
    }
    acc
  }
}

/** vector (array<float|double>, length ≥ m·dsub — extra dims ignored, the
  * [[NearestCentroidsExpr]] prefix contract) → its `m`-byte PQ code as
  * BINARY. Encoding cost O(dim · ksub) per row, paid ONCE at index append;
  * probes then pay code bytes instead of raw-vector IO.
  */
case class PqEncodeExpr(
    child: Expression,
    flatCodebook: IndexedSeq[Double],
    m: Int,
    ksub: Int,
    dsub: Int) extends UnaryExpression {

  require(m > 0 && dsub > 0 && ksub > 0 && ksub <= 256,
    "PQ needs 0 < ksub <= 256 (one byte per subspace) and positive m, dsub")
  require(flatCodebook.length == m * ksub * dsub, "flat codebook size must be m*ksub*dsub")

  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_pq_encode"

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_encode requires array<float|double>, got ${t.catalogString}")
  }

  @transient private lazy val flat: Array[Double] = flatCodebook.toArray

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val dim = m * dsub
    val vec = new Array[Double](dim)
    val n = math.min(dim, a.numElements())
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) vec(i) = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      i += 1
    }
    PqKernels.encode(vec, flat, m, ksub, dsub)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("pqFlat", flat, "double[]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val vec = ctx.freshName("vec")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |double[] $vec = new double[${m * dsub}];
         |int $n = java.lang.Math.min(${m * dsub}, $a.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) $vec[$i] = (double) $a.$get($i);
         |}
         |${ev.value} = graft.expressions.PqKernels.encode($vec, $flatRef, $m, $ksub, $dsub);
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

/** query (array<float|double>) → its ADC lookup table (array<double>,
  * m·ksub entries): the classic PQ serving trick — pay O(dim·ksub) ONCE
  * per query row, then every candidate scores in O(m) table gathers
  * ([[PqLutDotExpr]]). At 768 dims / m=96 that is 96 gathers per pair
  * instead of 768 multiplies. Bit-identical to [[PqAdcDotExpr]] (both
  * sum per-subspace partials), so the two scoring paths are
  * interchangeable without moving any threshold decision.
  */
case class PqLutExpr(
    child: Expression,
    flatCodebook: IndexedSeq[Double],
    m: Int,
    ksub: Int,
    dsub: Int) extends UnaryExpression {

  require(flatCodebook.length == m * ksub * dsub, "flat codebook size must be m*ksub*dsub")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_pq_lut"

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_lut requires array<float|double>, got ${t.catalogString}")
  }

  @transient private lazy val flat: Array[Double] = flatCodebook.toArray

  private def toVec(a: ArrayData): Array[Double] = {
    val dim = m * dsub
    val vec = new Array[Double](dim)
    val n = math.min(dim, a.numElements())
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) vec(i) = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      i += 1
    }
    vec
  }

  override def nullSafeEval(v: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      PqKernels.lut(toVec(v.asInstanceOf[ArrayData]), flat, m, ksub, dsub))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("pqFlat", flat, "double[]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val vec = ctx.freshName("vec")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |double[] $vec = new double[${m * dsub}];
         |int $n = java.lang.Math.min(${m * dsub}, $a.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) $vec[$i] = (double) $a.$get($i);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.expressions.PqKernels.lut($vec, $flatRef, $m, $ksub, $dsub));
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqLutExpr =
    copy(child = newChild)
}

/** (code: binary, lut: array<double>) → Σ over subspaces of
  * lut[sub · ksub + code_sub] — the O(m) candidate-side half of the ADC
  * lookup-table pair. See [[PqLutExpr]].
  */
case class PqLutDotExpr(
    left: Expression,
    right: Expression,
    m: Int,
    ksub: Int) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_lut_dot"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_lut_dot requires (binary, array<double>), got " +
        s"${l.catalogString} and ${r.catalogString}")
  }

  override def nullSafeEval(c: Any, l: Any): Any = {
    val code = c.asInstanceOf[Array[Byte]]
    val lut = l.asInstanceOf[ArrayData]
    var acc = 0.0
    var sub = 0
    while (sub < m) {
      acc += lut.getDouble(sub * ksub + (code(sub) & 0xFF))
      sub += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l) => {
      val acc = ctx.freshName("acc")
      val sub = ctx.freshName("sub")
      s"""
         |double $acc = 0.0;
         |for (int $sub = 0; $sub < $m; $sub++) {
         |  $acc += $l.getDouble($sub * $ksub + ($c[$sub] & 0xFF));
         |}
         |${ev.value} = $acc;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): PqLutDotExpr =
    copy(left = newLeft, right = newRight)
}

/** (code: binary, query: array<float|double>) → the asymmetric-distance
  * (ADC) dot product: Σ over subspaces of query_sub · centroid[code_sub].
  * The approximate inner product a PQ probe ranks by — O(dim) per pair on
  * code bytes, never touching the stored raw vector. For many candidates
  * per query, prefer the [[PqLutExpr]]/[[PqLutDotExpr]] pair (bit-identical
  * result, O(m) per pair).
  */
case class PqAdcDotExpr(
    left: Expression,
    right: Expression,
    flatCodebook: IndexedSeq[Double],
    m: Int,
    ksub: Int,
    dsub: Int) extends BinaryExpression {

  require(flatCodebook.length == m * ksub * dsub, "flat codebook size must be m*ksub*dsub")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc_dot"

  private lazy val isFloat = right.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, ArrayType(FloatType | DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_adc_dot requires (binary, array<float|double>), got " +
        s"${l.catalogString} and ${r.catalogString}")
  }

  @transient private lazy val flat: Array[Double] = flatCodebook.toArray

  override def nullSafeEval(c: Any, q: Any): Any = {
    val code = c.asInstanceOf[Array[Byte]]
    val a = q.asInstanceOf[ArrayData]
    val dim = m * dsub
    val vec = new Array[Double](dim)
    val n = math.min(dim, a.numElements())
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) vec(i) = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      i += 1
    }
    PqKernels.adcDot(vec, code, flat, m, ksub, dsub)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("pqFlat", flat, "double[]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (c, q) => {
      val vec = ctx.freshName("vec")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |double[] $vec = new double[${m * dsub}];
         |int $n = java.lang.Math.min(${m * dsub}, $q.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$q.isNullAt($i)) $vec[$i] = (double) $q.$get($i);
         |}
         |${ev.value} = graft.expressions.PqKernels.adcDot($vec, $c, $flatRef, $m, $ksub, $dsub);
         |""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): PqAdcDotExpr =
    copy(left = newLeft, right = newRight)
}
