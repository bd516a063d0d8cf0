package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** In-flight pipeline observability (the 100 TB replacement for re-running
  * checks): graft operators attach `observe()` metric nodes to the frames
  * they execute — evaluated DURING the action as ordinary aggregates, zero
  * extra passes — and this registry harvests them through a
  * [[QueryExecutionListener]] so drivers/monitors can read "rows merged,
  * partitions touched, hot buckets short-circuited" right after (or while)
  * the pipeline runs, instead of re-scanning the table to find out.
  *
  * The reference ships an after-the-fact checker (silver_check.py) that
  * re-reads silver and recounts; `observe` metrics are the same numbers
  * collected for free on the write path itself.
  *
  * Metric names are namespaced `graft.*`; each name maps to the most
  * recent Row of named aggregate values. Driver-side scalars the operator
  * already knows (e.g. touched-partition count — an O(partitions) collect
  * that already happened) are recorded via [[put]] under the same
  * namespace. Registration is per-session and idempotent; listener
  * callbacks arrive on Spark's listener thread, hence the concurrent map.
  *
  * ABSENCE MEANS ZERO: a metric attached to a subtree the optimizer proves
  * empty (e.g. the hot-bucket branch of a corpus with no hot buckets) is
  * pruned with the subtree by empty-relation propagation and never
  * reports. Readers treat a missing metric like a missing monitoring
  * series — zero activity — rather than forcing every plan to keep dead
  * branches alive just to say "0".
  */
object Metrics {

  private val latest = new ConcurrentHashMap[String, Row]()
  private val listeners = new ConcurrentHashMap[SparkSession, QueryExecutionListener]()

  /** Attach the harvesting listener to `spark` (idempotent per session). */
  def register(spark: SparkSession): Unit =
    listeners.computeIfAbsent(
      spark,
      s => {
        val l = new QueryExecutionListener {
          override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
            qe.observedMetrics.foreach { case (name, row) => latest.put(name, row) }
          override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
        }
        s.listenerManager.register(l)
        l
      })

  /** Record a driver-side scalar metric (single unnamed-struct Row). */
  def put(name: String, values: (String, Any)*): Unit =
    latest.put(name, Row.fromSeq(values.map(_._2)))

  /** Most recent Row observed under `name`, if any execution reported it.
    * Listener delivery is asynchronous — [[await]] for read-after-action.
    */
  def get(name: String): Option[Row] = Option(latest.get(name))

  /** Await a metric's arrival (listener callbacks are async w.r.t. the
    * action that produced them). Returns None on timeout.
    */
  def await(name: String, timeoutMs: Long = 10000L): Option[Row] = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var r = get(name)
    while (r.isEmpty && System.nanoTime() < deadline) {
      Thread.sleep(25L)
      r = get(name)
    }
    r
  }

  /** Snapshot of every metric harvested so far in this JVM. */
  def snapshot(): Map[String, Row] = {
    val b = Map.newBuilder[String, Row]
    latest.forEach((k, v) => b += k -> v)
    b.result()
  }

  /** Drop recorded values (test isolation / batch boundaries). */
  def reset(): Unit = latest.clear()

  /** One row per file scan of an EXECUTED DataFrame: what the scan
    * actually read (files opened, bytes, rows emitted) next to what the
    * plan promised (pushed filters, partition filters, read schema).
    * The programmatic answer to "did my filter prune?" — the counters
    * the measured-IO specs assert on, exposed for drivers and monitors.
    * Execute the frame first; an unexecuted plan reports zero counters.
    * Descends AQE final plans, query stages, reused exchanges,
    * subqueries, and cached-relation plans.
    *
    * A counter the scan node does not DEFINE reports −1, never 0 (the
    * ParquetStats "unknown must never read as zero" convention): most V2
    * scans (including built-in parquet V2) carry no `numFiles`/
    * `bytesRead` metric at all, and a consumer summing the report must
    * be able to tell "read nothing" from "this node cannot say".
    */
  final case class ScanStat(
      rootPaths: Seq[String],
      format: String,
      filesRead: Long,
      bytesRead: Long,
      rowsOutput: Long,
      readSchema: String,
      pushedFilters: String,
      partitionFilters: String)

  /** The effective children of a physical node for executed-plan walks:
    * the hidden subtrees wrapper nodes hold (AQE final plan, query-stage
    * plan, reused-exchange child, cached-relation plan) plus the regular
    * children and subqueries. EVERY plan walker in graft (this file's
    * [[scanReport]], the test tree's PlanMetrics) derives its traversal
    * from here — the unwrap knowledge lives once, so a new wrapper node
    * (a future AQE stage kind, a reused subquery) is added in one place,
    * not in three silently-diverging copies.
    */
  def planChildren(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    val hidden = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case im: InMemoryTableScanExec => Seq(im.relation.cachedPlan)
      case _ => Nil
    }
    hidden ++ p.children ++ p.subqueries
  }

  def scanReport(df: org.apache.spark.sql.DataFrame): Seq[ScanStat] = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val out = scala.collection.mutable.ListBuffer[ScanStat]()
    // one row per PHYSICAL scan node: exchange reuse and shared cached
    // relations route the tree back through the SAME node instance, and
    // emitting it twice would double-count IO that happened once for
    // anyone summing the report
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
    // absent metric key → -1 sentinel, NOT 0: "this node cannot say"
    // must never read as "read nothing" (see the method doc)
    def metric(p: SparkPlan, n: String): Long =
      p.metrics.get(n).map(_.value).getOrElse(-1L)
    def go(p: SparkPlan): Unit = {
      if (!seen.add(p)) return
      p match {
        case s: FileSourceScanExec =>
          out += ScanStat(
            rootPaths = s.relation.location.rootPaths.map(_.toString),
            format = s.relation.fileFormat.toString,
            filesRead = metric(s, "numFiles"),
            bytesRead = metric(s, "filesSize"),
            rowsOutput = metric(s, "numOutputRows"),
            readSchema = s.requiredSchema.catalogString,
            pushedFilters = s.metadata.getOrElse("PushedFilters", ""),
            partitionFilters = s.partitionFilters.mkString(", "))
        case s: BatchScanExec =>
          // DataSource V2 (Iceberg/Delta/v2 parquet): surface what the
          // generic node carries rather than silently reporting "no
          // scans ran" — an empty report must mean no scans, not an
          // unsupported node
          out += ScanStat(
            rootPaths = Nil,
            format = s.scan.getClass.getSimpleName,
            filesRead = metric(s, "numFiles"),
            bytesRead = metric(s, "bytesRead"),
            rowsOutput = metric(s, "numOutputRows"),
            readSchema = s.output.map(a => s"${a.name}:${a.dataType.simpleString}")
              .mkString("struct<", ",", ">"),
            pushedFilters = s.scan.description(),
            partitionFilters = "")
        case _ => ()
      }
      planChildren(p).foreach(go)
    }
    go(df.queryExecution.executedPlan)
    out.toList
  }
}
