package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Executed-plan metric readers shared by the v26 gate and the
  * data-skipping study (one definition, so a plan-shape change — a new
  * AQE wrapper node, say — cannot be fixed in one copy and silently
  * missed in the other). */
object PlanMetrics {

  /** All FileSourceScan nodes of an executed plan, descending through
    * AQE wrappers: under AQE a materialized exchange becomes a LEAF
    * QueryStageExec whose subtree is only reachable via `.plan`, so a
    * plain `collect` would report zero scans for any plan containing a
    * shuffle or broadcast. */
  private def scans(plan: SparkPlan): Seq[FileSourceScanExec] =
    plan.collect {
      case sc: FileSourceScanExec => Seq(sc)
      case qs: QueryStageExec => scans(qs.plan)
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
    }.flatten

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
    val found = scans(plan)
    require(found.nonEmpty,
      "filesRead: no FileSourceScanExec in the executed plan — the probe " +
        "frame must read files, or the metric is vacuously 0")
    found.map(_.metrics("numFiles").value).sum
  }

  /** Execute `df` and return how many DISTINCT file-scan operators its
    * executed plan ran — plan-tree references deduped by node identity
    * (`SparkPlan.id`), so a scan reached twice through exchange/stage
    * reuse counts ONCE, while a genuinely re-planned second scan of
    * the same source counts twice. The pin for "this multi-consumer
    * query reads its files exactly once". */
  def distinctFileScans(df: DataFrame): Int = {
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    scans(plan).map(_.id).distinct.size
  }
}
