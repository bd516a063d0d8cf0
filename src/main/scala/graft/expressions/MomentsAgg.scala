package graft.expressions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-group second-moment state: row count, upper-triangle Gram sums
  * (d(d+1)/2, row-major by (i, j ≥ i)), and first-moment sums (d).
  */
final class MomentsBuf(var n: Long, var dim: Int, var tri: Array[Double], var s1: Array[Double])

/** `graft_moments(vec)` — count + Σ qᵢ·qⱼ (full Gram) + Σ qᵢ over an
  * array column in ONE aggregate, the scale-safe shape for covariance
  * sufficient statistics: the rank-1 outer-product update runs INSIDE
  * the aggregate's update function, so per-row input is the O(d)
  * vector read into a d(d+1)/2-sized triangle buffer — never a per-row
  * d² array materialization (at d=768 that would be 590k doubles
  * allocated per row before any aggregation sees them) and never a
  * d²-term Catalyst expression. Symmetry halves the arithmetic: only
  * the upper triangle accumulates; eval mirrors it into the full
  * row-major d² layout consumers index by `pos = i·d + j`.
  *
  * Output: struct(cnt bigint, sums array<double> of length d²+d — the
  * row-major Gram then the first-moment vector), byte-compatible with
  * what `graft_vec_sum` over a flattened outer product produced.
  * Dimension is taken from the first non-null row per group and
  * enforced on the rest — mixed-dim inputs fail loudly. Sums are IEEE
  * doubles: exact (order-independent, bit-reproducible) when inputs
  * are integer-valued, as in the quantized-embedding contract.
  */
case class MomentsAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MomentsBuf] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false

  private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_moments requires array<float> or array<double>, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("cnt", LongType, nullable = false),
    StructField("sums", ArrayType(DoubleType, containsNull = false), nullable = false)))

  override def prettyName: String = "graft_moments"

  override def createAggregationBuffer(): MomentsBuf =
    new MomentsBuf(0L, 0, Array.emptyDoubleArray, Array.emptyDoubleArray)

  private def alloc(buf: MomentsBuf, d: Int): Unit = {
    buf.dim = d
    buf.tri = new Array[Double](d * (d + 1) / 2)
    buf.s1 = new Array[Double](d)
  }

  override def update(buf: MomentsBuf, input: InternalRow): MomentsBuf = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val d = arr.numElements()
      if (buf.n == 0L && buf.dim == 0) alloc(buf, d)
      require(buf.dim == d,
        s"graft_moments: mixed vector dimensions (${buf.dim} vs $d)")
      // one pass to a local primitive copy, then the triangle update
      val q = new Array[Double](d)
      var i = 0
      while (i < d) {
        // fail loudly: getDouble would read a NULL element as 0.0 and
        // silently bias every moment (the SQL face has no cleanVec
        // upstream; quarantine NULL-element vectors before aggregating)
        require(!arr.isNullAt(i),
          s"graft_moments: NULL element at position $i — quarantine NULL-element vectors upstream")
        q(i) = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        i += 1
      }
      var t = 0
      i = 0
      while (i < d) {
        val qi = q(i)
        buf.s1(i) += qi
        var j = i
        while (j < d) { buf.tri(t) += qi * q(j); t += 1; j += 1 }
        i += 1
      }
      buf.n += 1
    }
    buf
  }

  override def merge(buf: MomentsBuf, other: MomentsBuf): MomentsBuf = {
    if (other.n > 0L) {
      if (buf.n == 0L && buf.dim == 0) alloc(buf, other.dim)
      require(buf.dim == other.dim,
        s"graft_moments: mixed vector dimensions (${buf.dim} vs ${other.dim})")
      var i = 0
      while (i < other.tri.length) { buf.tri(i) += other.tri(i); i += 1 }
      i = 0
      while (i < other.s1.length) { buf.s1(i) += other.s1(i); i += 1 }
      buf.n += other.n
    }
    buf
  }

  override def eval(buf: MomentsBuf): Any = {
    val d = buf.dim
    val out = new Array[Double](d * d + d)
    var t = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val g = buf.tri(t)
        out(i * d + j) = g
        out(j * d + i) = g
        t += 1; j += 1
      }
      out(d * d + i) = buf.s1(i)
      i += 1
    }
    InternalRow(buf.n, new GenericArrayData(out))
  }

  override def serialize(buf: MomentsBuf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.n)
    out.writeInt(buf.dim)
    buf.tri.foreach(out.writeDouble)
    buf.s1.foreach(out.writeDouble)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MomentsBuf = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readLong()
    val d = in.readInt()
    val tri = Array.fill(d * (d + 1) / 2)(in.readDouble())
    val s1 = Array.fill(d)(in.readDouble())
    new MomentsBuf(n, d, tri, s1)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MomentsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MomentsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MomentsAgg =
    copy(child = newChildren.head)
}
