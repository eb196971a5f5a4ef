package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Executed-plan metric readers shared by the v26 gate and the
  * data-skipping study (one definition, so a plan-shape change — a new
  * AQE wrapper node, say — cannot be fixed in one copy and silently
  * missed in the other). */
object PlanMetrics {

  /** Execute `df` and return the total `numFiles` its FileSourceScan
    * nodes actually read — the observable data skipping changes. The
    * frame is executed here (collect) because metrics only exist on an
    * EXECUTED plan; calling count() separately would plan a second
    * query and read the metrics of neither. */
  def filesRead(df: DataFrame): Long = {
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collect {
      case sc: FileSourceScanExec => sc.metrics("numFiles").value
    }.sum
  }
}
