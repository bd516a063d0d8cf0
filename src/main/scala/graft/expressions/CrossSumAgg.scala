package graft.expressions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-group cross-product state: row count plus Σ a·bᵀ (m×n, row-major). */
final class CrossSumBuf(var n: Long, var m: Int, var w: Int, var sums: Array[Double])

/** `graft_cross_sum(a, b)` — count + Σ aᵢ·bⱼ over two array columns in
  * ONE aggregate: the rank-1 cross-product update runs inside the
  * aggregate's update (O(m+n) input per row into an m×n buffer, zero
  * per-row allocation beyond the two local copies), the
  * [[MomentsAgg]] discipline generalized to a PAIR of slices. This is
  * the kernel of the block-wise Gram decomposition
  * ([[graft.operators.Embeddings.momentsExactIntBlocked]]): at
  * dimensions where one d²-sized state is untenable (d ≳ 2048), each
  * (block i, block j) cell aggregates its own blockSize²-sized state.
  *
  * Output: struct(cnt bigint, sums array<double> of length m·n,
  * row-major over (a-index, b-index)). Shapes come from the first
  * non-null row per group and are enforced on the rest — mixed shapes
  * fail loudly; NULL elements fail loudly (reading them as 0.0 would
  * silently bias every statistic). Sums are IEEE doubles: exact and
  * order-independent when inputs are integer-valued, as in the
  * quantized-embedding contract.
  */
case class CrossSumAgg(
    left: Expression,
    right: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CrossSumBuf] {

  override def children: Seq[Expression] = Seq(left, right)
  override def nullable: Boolean = false

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private lazy val lFloat = isFloat(left)
  private lazy val rFloat = isFloat(right)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_cross_sum requires two array<float|double> columns, got " +
            s"${l.catalogString} and ${r.catalogString}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("cnt", LongType, nullable = false),
    StructField("sums", ArrayType(DoubleType, containsNull = false), nullable = false)))

  override def prettyName: String = "graft_cross_sum"

  override def createAggregationBuffer(): CrossSumBuf =
    new CrossSumBuf(0L, 0, 0, Array.emptyDoubleArray)

  private def read(arr: ArrayData, float: Boolean, what: String): Array[Double] = {
    val n = arr.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      require(!arr.isNullAt(i),
        s"graft_cross_sum: NULL element at $what position $i — quarantine upstream")
      out(i) = if (float) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    out
  }

  override def update(buf: CrossSumBuf, input: InternalRow): CrossSumBuf = {
    val lv = left.eval(input)
    val rv = right.eval(input)
    // both-or-neither: a half-NULL row has no well-defined contribution
    require((lv == null) == (rv == null),
      "graft_cross_sum: one side NULL and the other not — quarantine upstream")
    if (lv != null) {
      val a = read(lv.asInstanceOf[ArrayData], lFloat, "left")
      val b = read(rv.asInstanceOf[ArrayData], rFloat, "right")
      if (buf.n == 0L && buf.sums.isEmpty) {
        buf.m = a.length; buf.w = b.length
        buf.sums = new Array[Double](a.length * b.length)
      }
      require(buf.m == a.length && buf.w == b.length,
        s"graft_cross_sum: mixed shapes ((${buf.m},${buf.w}) vs (${a.length},${b.length}))")
      var t = 0
      var i = 0
      while (i < a.length) {
        val ai = a(i)
        var j = 0
        while (j < b.length) { buf.sums(t) += ai * b(j); t += 1; j += 1 }
        i += 1
      }
      buf.n += 1
    }
    buf
  }

  override def merge(buf: CrossSumBuf, other: CrossSumBuf): CrossSumBuf = {
    if (other.n > 0L) {
      if (buf.n == 0L && buf.sums.isEmpty) {
        buf.m = other.m; buf.w = other.w
        buf.sums = new Array[Double](other.sums.length)
      }
      require(buf.m == other.m && buf.w == other.w,
        s"graft_cross_sum: mixed shapes ((${buf.m},${buf.w}) vs (${other.m},${other.w}))")
      var i = 0
      while (i < other.sums.length) { buf.sums(i) += other.sums(i); i += 1 }
      buf.n += other.n
    }
    buf
  }

  override def eval(buf: CrossSumBuf): Any =
    InternalRow(buf.n, new GenericArrayData(buf.sums))

  override def serialize(buf: CrossSumBuf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.n)
    out.writeInt(buf.m)
    out.writeInt(buf.w)
    buf.sums.foreach(out.writeDouble)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CrossSumBuf = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readLong()
    val m = in.readInt()
    val w = in.readInt()
    val sums = Array.fill(m * w)(in.readDouble())
    new CrossSumBuf(n, m, w, sums)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CrossSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CrossSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CrossSumAgg =
    copy(left = newChildren(0), right = newChildren(1))
}
