package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}

/** Post-execution scan-IO accounting for layout pins: how many rows the
  * parquet readers actually emitted (i.e. rows of row groups that SURVIVED
  * footer min/max pruning — pruned row groups contribute nothing), summed
  * over every file scan in the executed plan. AQE wraps plans in
  * [[AdaptiveSparkPlanExec]], whose inner plan is a field rather than a
  * child, so the traversal descends through it explicitly (TreeNode.collect
  * sees nothing there — the documented vacuous-pass trap).
  *
  * Used by the range-layout pins (StoreLayoutSpec, ProbeScale `r14ops`):
  * a literal-key read of a `rangeBy`-laid store must emit ~1/files of the
  * rows an unranged store emits, because disjoint key ranges across files
  * turn the footer check into whole-file skips.
  */
object ScanStats {

  /** Sum of `numOutputRows` over every [[FileSourceScanExec]] in `plan`
    * (execute the query first — metrics are zero before the action runs).
    */
  def scanOutputRows(plan: SparkPlan): Long = {
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case s: FileSourceScanExec => Seq(s)
      case other => (other.children ++ other.subqueries).flatMap(scans)
    }
    scans(plan).map(_.metrics("numOutputRows").value).sum
  }

  /** Run `df` to completion (collect) and return (result size, rows emitted
    * by its file scans) — the one-call form the layout pins use.
    */
  def collectAndScanRows(df: DataFrame): (Long, Long) = {
    val n = df.collect().length.toLong
    (n, scanOutputRows(df.queryExecution.executedPlan))
  }
}
