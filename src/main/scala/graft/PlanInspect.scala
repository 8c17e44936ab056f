package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/**
 * Executed-plan traversal shared by the runtime gates (ScaleSmoke) and
 * the plan-quality specs: under AQE the executed tree nests inside
 * QueryStageExec leaves (ResultQueryStageExec wrapping the result
 * stage, ShuffleQueryStageExec wrapping each materialized exchange),
 * so a naive `children` walk never reaches the exchanges. One
 * implementation, one place to absorb the next Spark AQE node shape.
 */
object PlanInspect {

  /** The final adaptive plan (post-AQE re-plan), or the plan itself. */
  def executedPlan(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }

  /** Every node, descending through children AND query-stage leaves. */
  def flatten(p: SparkPlan): Seq[SparkPlan] =
    (p +: p.children.flatMap(flatten)) ++ (p match {
      case st: QueryStageExec => flatten(st.plan)
      case _ => Seq.empty
    })

  /** All nodes of an already-executed DataFrame's final plan. */
  def executedNodes(df: DataFrame): Seq[SparkPlan] =
    flatten(executedPlan(df))

  /** Largest per-exchange shuffleRecordsWritten in the executed plan;
    * 0 when the plan has no shuffle exchange (callers gating on
    * records should treat that as "plan shape changed", loudly). */
  def maxShuffleRecordsWritten(df: DataFrame): Long =
    executedNodes(df).collect {
      case e: ShuffleExchangeLike =>
        e.metrics.get("shuffleRecordsWritten").map(_.value).getOrElse(0L)
    }.foldLeft(0L)(math.max)
}
