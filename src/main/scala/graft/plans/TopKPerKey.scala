package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.ColumnBridge

/** Whole-operator Catalyst extension: top-k rows per key.
  *
  * The DataFrame idiom — `row_number().over(Window.partitionBy(key)
  * .orderBy(ord)) <= k` — shuffles EVERY row and then fully sorts every
  * key group, O(n log n) per group, only to throw all but k rows away. At
  * 100 TB that sort (and its spill) is the cost. This operator keeps a
  * bounded heap of k rows per key instead:
  *
  *   partial TopKPerKeyExec (map side, no distribution requirement)
  *     → hash exchange on the key (inserted by EnsureRequirements)
  *       → final TopKPerKeyExec
  *
  * Map-side partial pruning means the exchange carries at most
  * k × keys-per-partition rows — the same partial/final shape as a hash
  * aggregate, with O(n log k) heap work and O(keys × k) memory instead of
  * a full sort.
  *
  * The full extension ladder (SURVEY.md §7.3 / builder brief (c)):
  * logical `TopKPerKeyNode` → `TopKStrategy` (planner) → physical
  * `TopKPerKeyExec`, registered via SparkSessionExtensions
  * (GraftExtensions) or per-session `spark.experimental.extraStrategies`
  * (TopK.perKey does this automatically).
  */
case class TopKPerKeyNode(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan)
    extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      val partial = TopKPerKeyExec(keys, order, k, partial = true, planLater(child))
      TopKPerKeyExec(keys, order, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowOrd = RowOrdering.create(sortOrder, childOutput)
      // Max-heap by sort order: head = worst row currently kept for the key.
      implicit val heapOrd: Ordering[UnsafeRow] =
        (a: UnsafeRow, b: UnsafeRow) => rowOrd.compare(a, b)
      val heaps = new java.util.HashMap[UnsafeRow, scala.collection.mutable.PriorityQueue[UnsafeRow]]()
      iter.foreach { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = scala.collection.mutable.PriorityQueue.empty[UnsafeRow]
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) {
          heap += row.asInstanceOf[UnsafeRow].copy()
        } else if (rowOrd.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap += row.asInstanceOf[UnsafeRow].copy()
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** DataFrame-level API. */
object TopK {

  /** Top `k` rows per `keys` group by `order` (first k in that sort order).
    * Output row order within a group is unspecified — sort afterwards if
    * presentation order matters.
    */
  /** Deep-copy an expression without TreeNode tags: the Column→Expression
    * converter tags every node with its source ColumnNode, which is not
    * serializable — left in place it rides the exec's captured expressions
    * into the task closure and fails serialization.
    */
  private def stripTags(e: Expression): Expression =
    e.transformUp { case n => n.makeCopy(n.productIterator.map(_.asInstanceOf[AnyRef]).toArray) }

  def perKey(df: DataFrame, keys: Seq[String], order: Seq[Column], k: Int): DataFrame = {
    ensureStrategy(df.sparkSession)
    val orderExprs = order.map(c =>
      stripTags(ColumnBridge.eagerExpression(c)) match {
        case so: SortOrder => so
        case e => SortOrder(e, Ascending)
      })
    val node = TopKPerKeyNode(
      keys.map(UnresolvedAttribute(_)),
      orderExprs,
      k,
      df.queryExecution.analyzed)
    ColumnBridge.ofRows(df.sparkSession, node)
  }

  /** Idempotently add TopKStrategy to a session that was not built with
    * GraftExtensions.
    */
  def ensureStrategy(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ TopKStrategy
    }
}
