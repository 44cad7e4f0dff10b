package graft

import org.apache.spark.sql.DataFrame

/** Runtime per-operator SQLMetrics off a DataFrame's OWN QueryExecution —
  * the shared engine behind the dialect's `EXPLAIN ANALYZE` and the
  * DressRehearsal sf10 metrics artifact.
  *
  * Two traps this encapsulates (both measured in round 9):
  *  - `Dataset.foreach`/`collect` execute `rddQueryExecution`, a SEPARATE
  *    QueryExecution, so metrics accumulate on that other plan instance;
  *    `queryExecution.toRdd.foreach` executes THIS plan.
  *  - the pre-AQE plan tree hides the finalized stages; rendering must
  *    descend through AdaptiveSparkPlanExec.executedPlan / QueryStageExec
  *    .plan to see what actually ran.
  */
object PlanMetrics {

  /** EXECUTE the frame's plan and render it with every touched runtime
    * metric (output rows, spill bytes, shuffle bytes, peak memory, files
    * read, …) per operator. */
  def executeAndRender(df: DataFrame): String = {
    df.queryExecution.toRdd.foreach(_ => ())
    val sb = new StringBuilder
    render(df.queryExecution.executedPlan, 0, sb)
    sb.toString
  }

  private def render(p: org.apache.spark.sql.execution.SparkPlan, depth: Int,
                     sb: StringBuilder): Unit = {
    val ms = p.metrics.toSeq
      .map { case (k, m) => (k, m.value) }
      .filter(_._2 > 0) // untouched metrics stay at initial (0 / -1)
      .sortBy(_._1)
      .map { case (k, v) => s"$k=$v" }
    sb.append("  " * depth).append(p.nodeName)
    if (ms.nonEmpty) sb.append("  [").append(ms.mkString(", ")).append("]")
    sb.append('\n')
    val next = p match {
      // descend into the adaptively-finalized plan, not the pre-AQE one
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        Seq(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        Seq(s.plan)
      case other => other.children
    }
    next.foreach(render(_, depth + 1, sb))
  }

  /** Sum one metric name across the executed tree (e.g. "spill size",
    * "shuffle bytes written") — the headline numbers a scale audit pins. */
  def totalMetric(df: DataFrame, metricName: String): Long = {
    var acc = 0L
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
      p.metrics.foreach { case (key, m) =>
        if ((key.contains(metricName) ||
             m.name.exists(_.contains(metricName))) && m.value > 0)
          acc += m.value
      }
      (p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(s.plan)
        case other => other.children
      }).foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    acc
  }
}
