package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, FilterExec, SparkPlan}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec

/** Post-execution plan metrics for the measured-IO specs: the plan-shape
  * assertions (PushedFilters, ReadSchema) prove what a probe WOULD read;
  * these read the executed plan's row counters to prove what it DID.
  * Traversal derives from [[graft.operators.Metrics.planChildren]] — the
  * ONE place that knows how to unwrap AQE final plans, query stages,
  * reused exchanges, and cached-relation plans.
  */
object PlanMetrics {

  def allNodes(df: DataFrame): Seq[SparkPlan] = {
    val out = scala.collection.mutable.ListBuffer[SparkPlan]()
    def go(p: SparkPlan): Unit = {
      out += p
      graft.operators.Metrics.planChildren(p).foreach(go)
    }
    go(df.queryExecution.executedPlan)
    out.toList
  }

  def rows(p: SparkPlan): Long =
    p.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)

  /** The INNERMOST FilterExec above each parquet scan whose root path
    * contains `pathPart` — i.e. the executed row count that survives the
    * scan's predicate, which is what downstream stages actually touch
    * (scan-node numOutputRows is row-group granular: a fixture-sized file
    * is one row group, so the scan itself always reports the whole file).
    * Entering a cached plan resets the filter context: a filter OUTSIDE
    * the cache does not gate what the cache materialized.
    */
  def innermostFiltersOver(df: DataFrame, pathPart: String): Seq[FilterExec] = {
    val out = scala.collection.mutable.ListBuffer[FilterExec]()
    def go(p: SparkPlan, last: Option[FilterExec]): Unit = {
      val next = p match {
        case f: FilterExec => Some(f)
        case _: InMemoryTableScanExec => None
        case _ => last
      }
      p match {
        case s: FileSourceScanExec
            if s.relation.location.rootPaths.exists(_.toString.contains(pathPart)) =>
          next.foreach(out += _)
        case _ => ()
      }
      graft.operators.Metrics.planChildren(p).foreach(go(_, next))
    }
    go(df.queryExecution.executedPlan, None)
    out.toList
  }

  /** Cached-relation scans (Caches.pin feeds) whose output carries every
    * name in `outputCols` — how a specific pinned table is found in a
    * plan that caches several.
    */
  def cacheScansWith(df: DataFrame, outputCols: Seq[String]): Seq[InMemoryTableScanExec] =
    allNodes(df).collect {
      case im: InMemoryTableScanExec
          if outputCols.forall(c => im.output.exists(_.name == c)) => im
    }
}
