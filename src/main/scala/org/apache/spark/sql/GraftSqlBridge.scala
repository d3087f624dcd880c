package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into the private[sql] Column↔Expression converters —
  * the standard extension-point pattern for libraries adding native
  * Catalyst expressions (Spark 4 hides the Column(expr) constructor). */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame from a raw LogicalPlan (for custom logical operators). */
  def ofRows(spark: SparkSession, plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Observed (CollectMetrics) values from an executed plan, INCLUDING
    * subtrees AQE's empty-relation propagation replaced: when a
    * materialized stage proves part of the query empty,
    * `EmptyRelationExec(logical)` swallows the physical subtree — and
    * with it any `CollectMetricsExec` whose accumulator already ran —
    * so `QueryExecution.observedMetrics` comes back empty exactly when
    * an observation-carrying query returns zero rows. This walks into
    * the swallowed logical plan's `LogicalQueryStage.physicalPlan`
    * stages and merges whatever executed there. */
  def observedMetricsDeep(plan: execution.SparkPlan): Map[String, Row] = {
    val direct = execution.CollectMetricsExec.collect(plan)
    // the explicit trait upcast disambiguates from the 1-arg
    // collect(plan): Map overload (a Map is itself a Function1)
    val helper: execution.adaptive.AdaptiveSparkPlanHelper = execution.CollectMetricsExec
    val swallowed: Seq[catalyst.plans.logical.LogicalPlan] =
      helper.collect(plan) {
        case e: execution.EmptyRelationExec => e.logical
      }
    val nested = swallowed.flatMap { lp =>
      lp.collect {
        case s: execution.adaptive.LogicalQueryStage =>
          observedMetricsDeep(s.physicalPlan)
      }
    }
    nested.foldLeft(direct)(_ ++ _)
  }
}
