package graft.expressions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-group vector state: element-wise running sums plus a row count. */
final class VecSumBuf(var n: Long, var sums: Array[Double])

/** `graft_vec_sum(vec)` — element-wise sum + count over an array column
  * (float or double), the missing primitive for distributed centroid
  * math: `groupBy(cell).agg(graft_vec_sum(vec))` ships ONE (dim)-sized
  * state per cell per task up the standard partial/final tree, where the
  * compositional alternative (posexplode + groupBy(cell, pos)) multiplies
  * the exchange by the dimensionality.
  *
  * Output: struct(cnt bigint, sums array<double>); the caller divides for
  * the mean. Dimension is taken from the first non-null row per group and
  * enforced on the rest — mixed-dim inputs fail loudly rather than
  * truncate. Sums are IEEE doubles accumulated in partition order:
  * deterministic bit-for-bit when the inputs are integer-valued (exact
  * addition), and within standard FP reduction tolerance otherwise.
  */
case class VectorSumAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecSumBuf] {

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
        s"graft_vec_sum requires array<float> or array<double>, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("cnt", LongType, nullable = false),
    StructField("sums", ArrayType(DoubleType, containsNull = false), nullable = false)))

  override def prettyName: String = "graft_vec_sum"

  override def createAggregationBuffer(): VecSumBuf = new VecSumBuf(0L, Array.emptyDoubleArray)

  override def update(buf: VecSumBuf, input: InternalRow): VecSumBuf = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val d = arr.numElements()
      if (buf.n == 0L && buf.sums.isEmpty) buf.sums = new Array[Double](d)
      require(buf.sums.length == d,
        s"graft_vec_sum: mixed vector dimensions (${buf.sums.length} vs $d)")
      var i = 0
      while (i < d) {
        buf.sums(i) += (if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i))
        i += 1
      }
      buf.n += 1
    }
    buf
  }

  override def merge(buf: VecSumBuf, other: VecSumBuf): VecSumBuf = {
    if (other.n > 0L) {
      if (buf.n == 0L && buf.sums.isEmpty) buf.sums = new Array[Double](other.sums.length)
      require(buf.sums.length == other.sums.length,
        s"graft_vec_sum: mixed vector dimensions (${buf.sums.length} vs ${other.sums.length})")
      var i = 0
      while (i < other.sums.length) { buf.sums(i) += other.sums(i); i += 1 }
      buf.n += other.n
    }
    buf
  }

  override def eval(buf: VecSumBuf): Any =
    InternalRow(buf.n, new GenericArrayData(buf.sums))

  override def serialize(buf: VecSumBuf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.n)
    out.writeInt(buf.sums.length)
    buf.sums.foreach(out.writeDouble)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): VecSumBuf = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readLong()
    val sums = Array.fill(in.readInt())(in.readDouble())
    new VecSumBuf(n, sums)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorSumAgg =
    copy(child = newChildren.head)
}
