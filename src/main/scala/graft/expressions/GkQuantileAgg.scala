package graft.expressions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, QuantileSummaries}
import org.apache.spark.sql.catalyst.util.QuantileSummaries.Stats
import org.apache.spark.sql.types._

/** Mutable holder for a Greenwald–Khanna summary inside an aggregation
  * buffer. `qs == null` means "no relative-error chosen yet" — the merge
  * aggregate adopts the first sketch it sees (its own epsilon travels
  * inside the struct, so the merging query needs no epsilon parameter).
  */
final class GkBuffer(var qs: QuantileSummaries)

/** Codec between Spark's [[QuantileSummaries]] (the Greenwald–Khanna 2001
  * epsilon-approximate quantile summary Spark itself uses for
  * `approx_percentile`) and a PERSISTABLE struct column:
  *
  *   struct(relative_error double, count bigint,
  *          value array&lt;double&gt;, g array&lt;bigint&gt;, delta array&lt;bigint&gt;)
  *
  * `approx_percentile` answers one query and throws the summary away; at
  * 100 TB the summary itself is the asset. Persisting the (value, g,
  * delta) tuples — O((1/eps)·log(eps·n)) of them, a few KB at eps = 0.01 —
  * turns quantile profiling incremental: sketch each daily shard once when
  * it lands, store one row per shard, and answer "p99 over any date range"
  * by merging the covered rows in O(shards × sketch) with
  * [[GkMergeAgg]] — no rescan of the data. The same summary type flows
  * through Spark's partial/final aggregate tree, so a corpus sketch is one
  * scan with no key shuffle (the partials merge, nothing groups).
  *
  * Error contract (Greenwald & Khanna, SIGMOD 2001; Spark's merge follows
  * the additive-error analysis): a single summary built at `relative_error`
  * eps answers any quantile within eps·n ranks; merging summaries built at
  * eps_a and eps_b bounds the result by (eps_a + eps_b)·n_total in the
  * worst case. QuantileProperties pins both bounds.
  */
object GkSketch {
  val sketchType: StructType = StructType(Seq(
    StructField("relative_error", DoubleType, nullable = false),
    StructField("count", LongType, nullable = false),
    StructField("value", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("g", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("delta", ArrayType(LongType, containsNull = false), nullable = false)))

  /** Structural check for an incoming sketch: field NAMES AND TYPES
    * (nullability-insensitive — parquet round-trips relax it). A
    * name-only check would pass e.g. `count: int` or `value:
    * array<float>` to [[fromRow]]'s positional getters, which read raw
    * UnsafeRow bytes at the wrong widths — garbage quantiles, not an
    * analysis error.
    */
  def isSketchStruct(dt: DataType): Boolean = {
    def sameShape(a: DataType, b: DataType): Boolean = (a, b) match {
      case (x: StructType, y: StructType) =>
        x.length == y.length && x.fields.zip(y.fields).forall {
          case (f, g) => f.name == g.name && sameShape(f.dataType, g.dataType)
        }
      case (x: ArrayType, y: ArrayType) => sameShape(x.elementType, y.elementType)
      case _ => a == b
    }
    sameShape(dt, sketchType)
  }

  def empty(relativeError: Double): QuantileSummaries =
    new QuantileSummaries(
      QuantileSummaries.defaultCompressThreshold, relativeError,
      Array.empty[Stats], 0L, true)

  /** Flushes the head buffer (compress) and encodes. */
  def toRow(raw: QuantileSummaries): InternalRow = {
    val qs = raw.compress()
    val s = qs.sampled
    val values = new Array[Double](s.length)
    val gs = new Array[Long](s.length)
    val deltas = new Array[Long](s.length)
    var i = 0
    while (i < s.length) {
      values(i) = s(i).value; gs(i) = s(i).g; deltas(i) = s(i).delta
      i += 1
    }
    InternalRow(
      qs.relativeError, qs.count,
      new GenericArrayData(values), new GenericArrayData(gs), new GenericArrayData(deltas))
  }

  /** Decodes to a compressed summary ready for query/merge. */
  def fromRow(row: InternalRow): QuantileSummaries = {
    val values = row.getArray(2)
    val gs = row.getArray(3)
    val deltas = row.getArray(4)
    val stats = new Array[Stats](values.numElements())
    var i = 0
    while (i < stats.length) {
      stats(i) = Stats(values.getDouble(i), gs.getLong(i), deltas.getLong(i))
      i += 1
    }
    new QuantileSummaries(
      QuantileSummaries.defaultCompressThreshold, row.getDouble(0), stats, row.getLong(1), true)
  }

  /** Merge under the buffer protocol: compress both sides (merge requires
    * empty head buffers), shortcut empty operands (merging an empty
    * summary is identity — empty shards and the merge aggregate's zero
    * buffer must not perturb the result).
    */
  def mergeSummaries(a: QuantileSummaries, b: QuantileSummaries): QuantileSummaries = {
    val ca = a.compress()
    val cb = b.compress()
    if (cb.count == 0L) ca
    else if (ca.count == 0L) cb
    else ca.merge(cb)
  }

  /** Static decode-and-query entry shared by [[GkQuantilesExpr]]'s
    * interpreted and generated paths (single implementation, same pattern
    * as the other graft expressions). Returns null for an empty sketch —
    * a quantile of nothing is undefined, not 0.0.
    */
  def quantiles(row: InternalRow, probs: ArrayData): ArrayData = {
    val qs = fromRow(row)
    if (qs.count == 0L) return null
    val out = new Array[Double](probs.numElements())
    var i = 0
    while (i < out.length) {
      val p = probs.getDouble(i)
      require(p >= 0.0 && p <= 1.0, s"quantile probability $p out of [0, 1]")
      out(i) = qs.query(p).get
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  private[expressions] def serialize(raw: QuantileSummaries): Array[Byte] = {
    val qs = raw.compress()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeDouble(qs.relativeError)
    out.writeLong(qs.count)
    val s = qs.sampled
    out.writeInt(s.length)
    var i = 0
    while (i < s.length) {
      out.writeDouble(s(i).value); out.writeLong(s(i).g); out.writeLong(s(i).delta)
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  private[expressions] def deserialize(bytes: Array[Byte]): QuantileSummaries = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val re = in.readDouble()
    val count = in.readLong()
    val stats = new Array[Stats](in.readInt())
    var i = 0
    while (i < stats.length) {
      stats(i) = Stats(in.readDouble(), in.readLong(), in.readLong())
      i += 1
    }
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold, re, stats, count, true)
  }
}

/** `graft_gk_sketch(value[, relative_error])` — builds the persistable
  * Greenwald–Khanna quantile sketch of a numeric column (see [[GkSketch]]
  * for the struct layout, persistence story, and error contract).
  *
  * Accepts any numeric input; values are sketched as doubles (the same
  * widening `approx_percentile` applies). Nulls are skipped, matching SQL
  * aggregate semantics.
  */
case class GkQuantileAgg(
    child: Expression,
    relativeError: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GkBuffer] {

  require(relativeError > 0.0 && relativeError < 1.0,
    s"relative_error must be in (0, 1), got $relativeError")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_gk_sketch requires a numeric value column, got ${other.catalogString}")
  }

  override def dataType: DataType = GkSketch.sketchType
  override def prettyName: String = "graft_gk_sketch"

  override def createAggregationBuffer(): GkBuffer =
    new GkBuffer(GkSketch.empty(relativeError))

  override def update(buf: GkBuffer, input: InternalRow): GkBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val d = v match {
        case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
        case n: java.lang.Number => n.doubleValue()
      }
      buf.qs = buf.qs.insert(d)
    }
    buf
  }

  override def merge(buf: GkBuffer, other: GkBuffer): GkBuffer = {
    buf.qs = GkSketch.mergeSummaries(buf.qs, other.qs)
    buf
  }

  override def eval(buf: GkBuffer): Any = GkSketch.toRow(buf.qs)

  override def serialize(buf: GkBuffer): Array[Byte] = GkSketch.serialize(buf.qs)
  override def deserialize(bytes: Array[Byte]): GkBuffer =
    new GkBuffer(GkSketch.deserialize(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): GkQuantileAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GkQuantileAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GkQuantileAgg =
    copy(child = newChildren.head)
}

/** `graft_gk_merge(sketch)` — merges persisted [[GkSketch]] struct rows
  * (the sketch-of-sketches aggregate): answers a quantile over any union
  * of already-sketched shards in O(shards × sketch) without touching the
  * underlying data. The epsilon rides inside each sketch; mixed-epsilon
  * inputs merge under the additive bound documented on [[GkSketch]].
  *
  * An all-null / empty input yields the empty sketch at the default 0.01
  * epsilon (count = 0 — [[GkQuantilesExpr]] returns null for it).
  */
case class GkMergeAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GkBuffer] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType if GkSketch.isSketchStruct(s) =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_gk_merge requires a graft_gk_sketch struct, got ${other.catalogString}")
  }

  override def dataType: DataType = GkSketch.sketchType
  override def prettyName: String = "graft_gk_merge"

  override def createAggregationBuffer(): GkBuffer = new GkBuffer(null)

  override def update(buf: GkBuffer, input: InternalRow): GkBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val other = GkSketch.fromRow(v.asInstanceOf[InternalRow])
      buf.qs = if (buf.qs == null) other else GkSketch.mergeSummaries(buf.qs, other)
    }
    buf
  }

  override def merge(buf: GkBuffer, other: GkBuffer): GkBuffer = {
    if (other.qs != null) {
      buf.qs = if (buf.qs == null) other.qs else GkSketch.mergeSummaries(buf.qs, other.qs)
    }
    buf
  }

  override def eval(buf: GkBuffer): Any =
    GkSketch.toRow(if (buf.qs == null) GkSketch.empty(0.01) else buf.qs)

  override def serialize(buf: GkBuffer): Array[Byte] =
    if (buf.qs == null) Array.emptyByteArray else GkSketch.serialize(buf.qs)
  override def deserialize(bytes: Array[Byte]): GkBuffer =
    new GkBuffer(if (bytes.isEmpty) null else GkSketch.deserialize(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): GkMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GkMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GkMergeAgg =
    copy(child = newChildren.head)
}

/** `graft_gk_quantiles(sketch, array(p1, p2, …))` — decodes a persisted
  * [[GkSketch]] struct and answers the given quantile probabilities as
  * `array&lt;double&gt;` (null for an empty sketch). Scalar, so a merged
  * sketch can be queried in the same SELECT that merged it; evaluates on
  * the handful of merged rows, via the shared static in [[GkSketch]] from
  * both the interpreted and generated paths.
  */
case class GkQuantilesExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (s: StructType, ArrayType(DoubleType, _)) if GkSketch.isSketchStruct(s) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_gk_quantiles(sketch struct, array<double>) — got ${l.catalogString}, ${r.catalogString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gk_quantiles"

  override def nullSafeEval(sketch: Any, probs: Any): Any =
    GkSketch.quantiles(sketch.asInstanceOf[InternalRow], probs.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sketch, probs) => {
      val gk = GkSketch.getClass.getName.stripSuffix("$")
      s"""
         |${ev.value} = $gk.quantiles($sketch, $probs);
         |${ev.isNull} = ${ev.value} == null;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GkQuantilesExpr =
    copy(left = newLeft, right = newRight)
}
