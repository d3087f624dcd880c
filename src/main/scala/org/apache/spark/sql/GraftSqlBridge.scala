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
  /** Count shuffle exchanges in the FINAL adaptive plan, walking into
    * query stages but NOT into cached (InMemoryTableScan) subtrees or
    * reused exchanges — a cached relation's build-time exchange is paid
    * once at cache fill, not per query, and a reused exchange moves no
    * new data. For PlanSpec shape pins, where toString counting would
    * double-count AQE's printed initial plan and cache internals. */
  def countShuffleExchanges(plan: execution.SparkPlan): Int = plan match {
    case a: execution.adaptive.AdaptiveSparkPlanExec => countShuffleExchanges(a.executedPlan)
    case q: execution.adaptive.QueryStageExec => countShuffleExchanges(q.plan)
    case _: execution.columnar.InMemoryTableScanExec => 0
    case _: execution.exchange.ReusedExchangeExec => 0
    case s: execution.exchange.ShuffleExchangeLike =>
      1 + s.children.map(countShuffleExchanges).sum
    case other => other.children.map(countShuffleExchanges).sum
  }

  /** Rows EMITTED by file scans in the final adaptive plan — i.e. rows
    * surviving parquet row-group/page pruning from pushed filters,
    * before any post-scan Filter. The direct evidence for layout-
    * driven pruning (Layout.zOrder): a clustered table's scan emits a
    * fraction of the table for a slab predicate, an unclustered one
    * emits everything. Call AFTER an action so the metric is
    * populated. */
  def scanOutputRows(plan: execution.SparkPlan): Long = plan match {
    case a: execution.adaptive.AdaptiveSparkPlanExec => scanOutputRows(a.executedPlan)
    case q: execution.adaptive.QueryStageExec => scanOutputRows(q.plan)
    case s: execution.FileSourceScanExec => s.metrics.get("numOutputRows").map(_.value).getOrElse(0L)
    case other => other.children.map(scanOutputRows).sum
  }

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
