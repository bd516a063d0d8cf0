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

/** Per-group funnel state: the minimum step-0 timestamp (greedy always
  * anchors there, so ONE long suffices for the usually-dominant entry
  * step), a buffer of later-step events, and an overflow flag.
  */
final class FunnelBuf(
    var hasStep0: Boolean,
    var minStep0: Long,
    val ts: mutable.ArrayBuffer[Long],
    val step: mutable.ArrayBuffer[Int],
    var n: Long,
    var overflowed: Boolean)

/** `graft_funnel(ts, event_type, steps[, max_gap])` — the greedy
  * earliest-chain funnel ([[graft.operators.Funnel]]) as a native
  * mergeable aggregate, which is what makes the funnel catalog entry
  * reachable from a PURE SQL session:
  *
  * {{{
  *   SELECT user_id,
  *          graft_funnel(ts_us, event_type, array('view','click','purchase')) AS times
  *   FROM events GROUP BY user_id
  * }}}
  *
  * Semantics are IDENTICAL to `Funnel.earliestChain` (t₁ = min step-1
  * ts; tᵢ = min step-i ts strictly after tᵢ₋₁, within `max_gap` when
  * given): events are buffered unordered, sorted once per group at eval
  * time by (ts, step) — the same total order as the DataFrame fold's
  * `array_sort(struct(ts, step))` — and folded greedily. Acceptance
  * depends only on (step, ts > last-accepted), so equal-timestamp
  * orderings cannot change the outcome.
  *
  * State discipline: non-step events are dropped at update (never
  * buffered); step-0 events collapse into one running minimum — greedy
  * anchors on the earliest entry event, so the usually-largest event
  * class (views) costs ONE long per group, not a buffer entry. Remaining
  * state is bounded by the group's later-step activity, and `maxEvents`
  * bounds even that: a group whose funnel-event count exceeds the cap
  * evaluates to NULL (a loud, documented sentinel — `WHERE size(times) >
  * 0` drops it like a depth-0 user, and the DataFrame path's
  * `oversizeUsers` audit view identifies the actors). The cap counts
  * post-filter funnel events, matching `maxEventsPerUser`.
  */
case class FunnelAgg(
    tsExpr: Expression,
    typeExpr: Expression,
    steps: Seq[String],
    maxGap: Option[Long],
    maxEvents: Long = 1L << 20,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FunnelBuf] {

  require(steps.nonEmpty, "funnel needs at least one step")
  require(steps.distinct.size == steps.size, "repeated step types are ambiguous")
  require(maxGap.forall(_ > 0L), "max_gap must be positive")
  require(maxEvents > 0L, "maxEvents must be positive")

  @transient private lazy val stepIndex: Map[String, Int] = steps.zipWithIndex.toMap
  private val k = steps.size

  override def children: Seq[Expression] = tsExpr :: typeExpr :: Nil
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (tsExpr.dataType, typeExpr.dataType) match {
    case (LongType | IntegerType, StringType) => TypeCheckResult.TypeCheckSuccess
    case (t, s) =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_funnel requires (bigint/int ts, string event_type), got " +
          s"(${t.catalogString}, ${s.catalogString})")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_funnel"

  override def createAggregationBuffer(): FunnelBuf =
    new FunnelBuf(false, 0L, mutable.ArrayBuffer.empty, mutable.ArrayBuffer.empty, 0L, false)

  private def tsLong(v: Any): Long = v match {
    case l: java.lang.Long => l.longValue()
    case i: java.lang.Integer => i.longValue()
  }

  private def trip(buf: FunnelBuf): Unit = {
    buf.overflowed = true
    buf.ts.clear()   // over-cap groups must not go on accreting memory
    buf.step.clear()
  }

  override def update(buf: FunnelBuf, input: InternalRow): FunnelBuf = {
    val t = tsExpr.eval(input)
    val tp = typeExpr.eval(input)
    if (t != null && tp != null) {
      stepIndex.get(tp.asInstanceOf[UTF8String].toString) match {
        case None => // not a funnel step: never buffered
        case Some(idx) =>
          buf.n += 1
          if (buf.overflowed || buf.n > maxEvents) trip(buf)
          else if (idx == 0) {
            val ts = tsLong(t)
            if (!buf.hasStep0 || ts < buf.minStep0) { buf.hasStep0 = true; buf.minStep0 = ts }
          } else {
            buf.ts += tsLong(t)
            buf.step += idx
          }
      }
    }
    buf
  }

  override def merge(buf: FunnelBuf, other: FunnelBuf): FunnelBuf = {
    buf.n += other.n
    if (buf.overflowed || other.overflowed || buf.n > maxEvents) trip(buf)
    else {
      if (other.hasStep0 && (!buf.hasStep0 || other.minStep0 < buf.minStep0)) {
        buf.hasStep0 = true
        buf.minStep0 = other.minStep0
      }
      buf.ts ++= other.ts
      buf.step ++= other.step
    }
    buf
  }

  override def eval(buf: FunnelBuf): Any = {
    if (buf.overflowed) return null
    if (!buf.hasStep0) return new GenericArrayData(Array.empty[Long])
    val order = buf.ts.indices.sortBy(i => (buf.ts(i), buf.step(i)))
    val times = mutable.ArrayBuffer(buf.minStep0)
    order.foreach { i =>
      val depth = times.size
      if (depth < k && buf.step(i) == depth) {
        val ts = buf.ts(i)
        val last = times.last
        if (ts > last && maxGap.forall(g => ts - last <= g)) times += ts
      }
    }
    new GenericArrayData(times.toArray)
  }

  override def serialize(buf: FunnelBuf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeBoolean(buf.overflowed)
    out.writeBoolean(buf.hasStep0)
    out.writeLong(buf.minStep0)
    out.writeLong(buf.n)
    out.writeInt(buf.ts.size)
    var i = 0
    while (i < buf.ts.size) {
      out.writeLong(buf.ts(i))
      out.writeInt(buf.step(i))
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): FunnelBuf = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val overflowed = in.readBoolean()
    val hasStep0 = in.readBoolean()
    val minStep0 = in.readLong()
    val n = in.readLong()
    val size = in.readInt()
    val ts = new mutable.ArrayBuffer[Long](size)
    val step = new mutable.ArrayBuffer[Int](size)
    var i = 0
    while (i < size) {
      ts += in.readLong()
      step += in.readInt()
      i += 1
    }
    new FunnelBuf(hasStep0, minStep0, ts, step, n, overflowed)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FunnelAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FunnelAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FunnelAgg =
    copy(tsExpr = newChildren(0), typeExpr = newChildren(1))
}
