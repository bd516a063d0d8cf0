package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, FilterExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Post-execution plan metrics for the measured-IO specs: the plan-shape
  * assertions (PushedFilters, ReadSchema) prove what a probe WOULD read;
  * these read the executed plan's row counters to prove what it DID.
  * Walks through AQE final plans, query stages, reused exchanges,
  * subqueries, and cached-relation plans.
  */
object PlanMetrics {

  def allNodes(df: DataFrame): Seq[SparkPlan] = {
    val out = scala.collection.mutable.ListBuffer[SparkPlan]()
    def go(p: SparkPlan): Unit = {
      out += p
      p match {
        case a: AdaptiveSparkPlanExec => go(a.executedPlan)
        case q: QueryStageExec => go(q.plan)
        case r: ReusedExchangeExec => go(r.child)
        case im: InMemoryTableScanExec => go(im.relation.cachedPlan)
        case _ => ()
      }
      (p.children ++ p.subqueries).foreach(go)
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
    */
  def innermostFiltersOver(df: DataFrame, pathPart: String): Seq[FilterExec] = {
    val out = scala.collection.mutable.ListBuffer[FilterExec]()
    def go(p: SparkPlan, last: Option[FilterExec]): Unit = {
      val next = p match {
        case f: FilterExec => Some(f)
        case _ => last
      }
      p match {
        case a: AdaptiveSparkPlanExec => go(a.executedPlan, next)
        case q: QueryStageExec => go(q.plan, next)
        case r: ReusedExchangeExec => go(r.child, next)
        case im: InMemoryTableScanExec => go(im.relation.cachedPlan, None)
        case s: FileSourceScanExec
            if s.relation.location.rootPaths.exists(_.toString.contains(pathPart)) =>
          next.foreach(out += _)
        case _ => ()
      }
      (p.children ++ p.subqueries).foreach(go(_, next))
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
