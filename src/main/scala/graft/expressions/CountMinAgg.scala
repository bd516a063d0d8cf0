package graft.expressions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min frequency sketch buffer: depth × width counters, row-major. */
final class CMSketch(var n: Long, val width: Int, val depth: Int, val counters: Array[Long])

/** Shared bucket function so executor-side updates and driver-side point
  * queries hash identically (one implementation, like [[MisraGries]]).
  */
object CountMin {
  /** Row `i`'s bucket for `item`: murmur3 under a per-row seed. */
  def bucket(item: String, i: Int, width: Int): Int =
    java.lang.Math.floorMod(
      scala.util.hashing.MurmurHash3.stringHash(item, 0x9747b28c + i), width)
}

/** Count-Min sketch as a native mergeable aggregate — the ESTIMATE-side
  * complement of [[MisraGriesAgg]]'s candidate set.
  *
  * MG answers "which items might be heavy" (guaranteed superset, counts
  * UNDERestimated); CM answers "about how often did THIS item occur"
  * (any item, counts OVERestimated: estimate ∈ [true, true + ε·n] with
  * ε = e/width per hash row, failure probability e^−depth after the min
  * across rows — Cormode & Muthukrishnan 2005). Merge is element-wise
  * counter addition, so partials combine up a standard aggregate tree and
  * across corpus shards/streams losslessly: sketch(A ∪ B) EQUALS
  * merge(sketch(A), sketch(B)) exactly, not approximately.
  *
  * State is width × depth longs per partial regardless of input size or
  * cardinality — the same no-long-tail-shuffle scale story as MG (a
  * groupBy(term).count() at 100 TB shuffles billions of keys to answer
  * point queries a 10 KB sketch serves).
  *
  * Output: struct(total: bigint, width: int, depth: int,
  * counters: array<bigint>) — decode with [[graft.operators.Frequency]]'s
  * CmSummary, whose `estimate` uses the same [[CountMin.bucket]].
  */
case class CountMinAgg(
    child: Expression,
    width: Int,
    depth: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CMSketch] {

  require(width > 0 && depth > 0, "width and depth must be positive")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_cm_sketch requires a string item column, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("total", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("depth", IntegerType, nullable = false),
    StructField("counters", ArrayType(LongType, containsNull = false), nullable = false)))

  override def prettyName: String = "graft_cm_sketch"

  override def createAggregationBuffer(): CMSketch =
    new CMSketch(0L, width, depth, new Array[Long](width * depth))

  override def update(buf: CMSketch, input: InternalRow): CMSketch = {
    val v = child.eval(input)
    if (v != null) {
      buf.n += 1
      val item = v.asInstanceOf[UTF8String].toString
      var i = 0
      while (i < depth) {
        buf.counters(i * width + CountMin.bucket(item, i, width)) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(buf: CMSketch, other: CMSketch): CMSketch = {
    buf.n += other.n
    var i = 0
    while (i < buf.counters.length) {
      buf.counters(i) += other.counters(i)
      i += 1
    }
    buf
  }

  override def eval(buf: CMSketch): Any =
    InternalRow(buf.n, buf.width, buf.depth, new GenericArrayData(buf.counters))

  override def serialize(buf: CMSketch): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.n)
    var i = 0
    while (i < buf.counters.length) { out.writeLong(buf.counters(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CMSketch = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readLong()
    val counters = new Array[Long](width * depth)
    var i = 0
    while (i < counters.length) { counters(i) = in.readLong(); i += 1 }
    new CMSketch(n, width, depth, counters)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(child = newChildren.head)
}
