package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Automatic per-action instrumentation: a QueryExecutionListener that
  * records every completed Spark action's wall time and total file-scan
  * output rows into [[Metrics]] — the engine-side counterpart of the
  * reference's per-operation named timers, without manual `Metrics.time`
  * wrapping at call sites.
  *
  * Callbacks arrive asynchronously on the listener bus; samples appear
  * shortly after the action returns.
  */
object MetricsListener {

  /** Sum file-scan output rows, descending through AQE wrappers
    * (AdaptiveSparkPlanExec and materialized query stages are leaf nodes
    * to the plain collect, hiding every scan under them).
    */
  private def scanRows(p: org.apache.spark.sql.execution.SparkPlan): Long = {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val self = p match {
      case s: FileSourceScanExec =>
        s.metrics.get("numOutputRows").map(_.value).getOrElse(0L)
      case _ => 0L
    }
    val deeper = p match {
      case a: AdaptiveSparkPlanExec => scanRows(a.executedPlan)
      case q: QueryStageExec => scanRows(q.plan)
      case other => other.children.map(scanRows).sum
    }
    self + deeper
  }

  final class Listener extends QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution,
        durationNs: Long): Unit =
      Metrics.record("query_execution_time", durationNs / 1e9,
        Map("action" -> funcName,
          "scan_rows" -> scanRows(qe.executedPlan).toString))

    override def onFailure(funcName: String, qe: QueryExecution,
        exception: Exception): Unit =
      Metrics.record("query_failure", 0.0, Map("action" -> funcName,
        "error" -> exception.getClass.getSimpleName))
  }

  def install(spark: SparkSession): Listener = {
    val l = new Listener
    spark.listenerManager.register(l)
    l
  }

  def uninstall(spark: SparkSession, l: Listener): Unit =
    spark.listenerManager.unregister(l)
}
