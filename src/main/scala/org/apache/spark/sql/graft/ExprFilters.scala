package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.PredicateHelper
import org.apache.spark.sql.catalyst.plans.logical.{Filter => LogicalFilter}
import org.apache.spark.sql.execution.datasources.DataSourceStrategy
import org.apache.spark.sql.sources.{Filter => V1Filter}

/** Bridge for `graft.lake`: resolve a `Column` predicate against a plan
  * and translate its top-level conjuncts into v1 source `Filter`s — the
  * shape [[graft.lake.StatsSidecar]] evaluates against per-file stats.
  * Lives in this package because `DataSourceStrategy` is `private[sql]`.
  *
  * Analysis only — no job runs. Anything that fails to resolve or
  * translate simply drops out (the caller prunes less, never wrongly).
  */
object ExprFilters extends PredicateHelper {
  def toV1(df: DataFrame, pred: Column): Seq[V1Filter] =
    try {
      // the OPTIMIZED plan, not the analyzed one: analysis leaves literal
      // casts unfolded (`k = CAST(5 AS BIGINT)`), which no v1 translation
      // matches — the same reason real pushdown runs post-optimization.
      // The optimizer also contributes the IsNotNull guards, which prune
      // all-null files for free
      val optimized = df.filter(pred).queryExecution.optimizedPlan
      optimized.collectFirst {
        case f: LogicalFilter => splitConjunctivePredicates(f.condition)
      }.getOrElse(Nil).flatMap(e =>
        DataSourceStrategy.translateFilter(
          e, supportNestedPredicatePushdown = true))
    } catch { case scala.util.control.NonFatal(_) => Nil }
}
