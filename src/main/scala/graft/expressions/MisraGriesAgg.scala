package graft.expressions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequency summary: bounded-state single-pass candidate set. */
final class MGSummary(var n: Long, val counts: mutable.HashMap[String, Long])

/** The MG update/merge core, factored out of the aggregate so OTHER state
  * holders (the streaming heavy-hitters operator's per-shard
  * mapGroupsWithState state) run the IDENTICAL algorithm — the survival
  * guarantee proofs hold for one implementation, not two drifting copies.
  */
object MisraGries {

  /** One arrival, in place: increment a tracked counter, claim a free one,
    * or run the decrement-all step (every tracked count pays for the
    * untracked arrival; zeros vacate their counter). O(k) worst case,
    * amortized O(1)/row.
    */
  def updateOne(counts: mutable.HashMap[String, Long], k: Int, item: String): Unit = {
    val cur = counts.getOrElse(item, 0L)
    if (cur > 0L || counts.size < k) counts.update(item, cur + 1L)
    else {
      val dead = mutable.ArrayBuffer.empty[String]
      counts.mapValuesInPlace((_, c) => c - 1L)
      counts.foreach { case (i, c) => if (c == 0L) dead += i }
      dead.foreach(counts.remove)
    }
  }

  /** Bound-preserving reduction after a merge: subtract the (k+1)-th
    * largest combined count from everything and drop the non-positive
    * (Agarwal et al., PODS'12). No-op at <= k counters.
    */
  def reduceToK(counts: mutable.HashMap[String, Long], k: Int): Unit =
    if (counts.size > k) {
      val d = counts.values.toArray.sortWith(_ > _).apply(k)
      val dead = mutable.ArrayBuffer.empty[String]
      counts.mapValuesInPlace((_, c) => c - d)
      counts.foreach { case (i, c) => if (c <= 0L) dead += i }
      dead.foreach(counts.remove)
    }
}

/** Misra–Gries heavy-hitter sketch as a native mergeable aggregate.
  *
  * Keeps at most `k` counters per partial; any item whose true frequency
  * exceeds n/(k+1) is GUARANTEED to survive, and a surviving counter
  * undercounts by at most n/(k+1) (Misra & Gries 1982; merge rule and the
  * preserved bound are the mergeable-summaries result of Agarwal et al.,
  * PODS'12). State is O(k) regardless of input size or cardinality — the
  * whole point vs. a groupBy: at 100 TB a full term count shuffles
  * billions of distinct keys; this ships ONE k-counter summary per
  * partition up a standard partial/final aggregate tree.
  *
  * Output: struct(total: bigint, items: array<struct<item: string,
  * count_low: bigint>>) — items sorted by (count desc, item asc) for
  * determinism; count_low is the surviving (under)count, the true count is
  * within [count_low, count_low + total/(k+1)].
  *
  * This is deliberately a TypedImperativeAggregate (like Spark's own
  * percentile/count-min/bloom aggregates), not codegen: the per-row work
  * is one hash-map probe; the win is mergeable bounded state, not loop
  * fusion.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGSummary] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_mg_sketch requires a string item column, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("total", LongType, nullable = false),
    StructField("items", ArrayType(StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("count_low", LongType, nullable = false))), containsNull = false),
      nullable = false)))

  override def prettyName: String = "graft_mg_sketch"

  override def createAggregationBuffer(): MGSummary =
    new MGSummary(0L, mutable.HashMap.empty)

  override def update(buf: MGSummary, input: InternalRow): MGSummary = {
    val v = child.eval(input)
    if (v != null) {
      buf.n += 1
      MisraGries.updateOne(buf.counts, k, v.asInstanceOf[UTF8String].toString)
    }
    buf
  }

  override def merge(buf: MGSummary, other: MGSummary): MGSummary = {
    buf.n += other.n
    other.counts.foreach { case (i, c) =>
      buf.counts.update(i, buf.counts.getOrElse(i, 0L) + c)
    }
    MisraGries.reduceToK(buf.counts, k)
    buf
  }

  override def eval(buf: MGSummary): Any = {
    val sorted = buf.counts.toArray.sortBy { case (i, c) => (-c, i) }
    InternalRow(
      buf.n,
      new GenericArrayData(sorted.map { case (i, c) =>
        InternalRow(UTF8String.fromString(i), c)
      }))
  }

  override def serialize(buf: MGSummary): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.n)
    out.writeInt(buf.counts.size)
    // length-prefixed raw UTF-8, NOT writeUTF: modified-UTF-8 caps a
    // string at 65535 encoded bytes and a single >64KB whitespace-free
    // item (minified JS, base64 blob) would crash the aggregation.
    buf.counts.foreach { case (i, c) =>
      val b = i.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MGSummary = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readLong()
    val size = in.readInt()
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < size) {
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      m.update(new String(b, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    new MGSummary(n, m)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
}
