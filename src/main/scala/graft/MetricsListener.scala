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

  final class Listener extends QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution,
        durationNs: Long): Unit = {
      val scanRows = qe.executedPlan.collectWithSubqueries {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics.get("numOutputRows").map(_.value).getOrElse(0L)
      }.sum
      Metrics.record("query_execution_time", durationNs / 1e9,
        Map("action" -> funcName, "scan_rows" -> scanRows.toString))
    }

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
