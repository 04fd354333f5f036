// Lives under org.apache.spark.sql to reach the private[sql] surfaces a
// whole-operator extension needs (Dataset.ofRows, ExpressionUtils) — the
// conventional home for third-party physical operators.
package org.apache.spark.sql.graft

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Logical "keep the top `k` rows of every key group, ordered by `order`"
  * operator — the per-key analogue of Spark's global
  * `TakeOrderedAndProject`, which Spark itself has no whole-operator form
  * for: the built-in formulation (`row_number()` over a window + filter)
  * SORTS EVERY GROUP COMPLETELY and shuffles every input row to do so.
  *
  * This node plans (see [[TopKPerKeyStrategy]]) into a partial/final
  * physical pair modeled on partial aggregation: each input partition first
  * reduces to at most `k` rows per key with a bounded heap — no sort, no
  * codegen break below it — and only those survivors cross the one
  * hash-partitioned exchange, where an identical heap pass merges them.
  * At 100 TB the shuffle therefore carries ≤ k·(keys per partition) rows
  * instead of the full table, and nothing is ever globally sorted.
  *
  * Semantics pin: ties are resolved by the caller supplying a total order
  * (the gates tie-break on a unique id column), making the kept set — and
  * hence the oracle hash — deterministic.
  */
case class TopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"top-k requires k > 0, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Planner strategy (SparkSessionExtensions `injectPlannerStrategy` — wired
  * in graft.GraftExtensions): plans the logical node as final-over-partial.
  * `EnsureRequirements` inserts the single hash exchange between the two
  * from the final node's required ClusteredDistribution, exactly as it does
  * for a partial/final aggregate pair.
  */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Physical per-partition top-k-per-key. One implementation serves both
  * phases; only the required child distribution differs (partial runs
  * wherever the data already is, final demands key-clustering).
  *
  * Memory contract: the operator holds at most k rows per distinct key per
  * partition (plus one grouping key copy each) — the same working-set shape
  * as a map-side combine. Rows are never buffered beyond the heaps and the
  * input is consumed in one pass, so the kept set is strictly a subset of
  * the input.
  */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKeyFinal"

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  protected override def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val attrs = output
    val numOutputRows = longMetric("numOutputRows")
    child.execute().mapPartitionsInternal { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, attrs)
      // BaseOrdering: compare(a, b) < 0 iff a sorts first — "top k" = the k
      // ordering-smallest rows. The heap surfaces the WORST kept row for O(1)
      // eviction tests, so it is a max-heap under the same ordering.
      val ord: Ordering[InternalRow] = RowOrdering.create(sortOrder, attrs)
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        heaps.get(key) match {
          case None =>
            val h = mutable.PriorityQueue.empty[InternalRow](ord)
            h.enqueue(row.copy())
            heaps.put(key.copy(), h) // the projection reuses its buffer: copy
          case Some(h) if h.size < limit =>
            h.enqueue(row.copy())
          case Some(h) if ord.compare(row, h.head) < 0 =>
            h.dequeue()
            h.enqueue(row.copy())
          case _ => () // worse than the kept k: drop
        }
      }
      heaps.valuesIterator.flatMap { h =>
        // dequeueAll drains worst-first; reverse restores the sort order
        h.dequeueAll.reverseIterator.map { (r: InternalRow) =>
          numOutputRows += 1
          r
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Public construction surface (graft code calls this; SQL users go through
  * the DataFrame API result like any other frame).
  */
object TopK {

  /** Top `k` rows per `keyCols` group under `orderBy` (supply a total order —
    * include a unique tie-break column — for a deterministic kept set).
    */
  def perKey(df: DataFrame, keyCols: Seq[String], orderBy: Seq[Column], k: Int): DataFrame = {
    val child = df.queryExecution.analyzed
    val resolver = df.sparkSession.sessionState.conf.resolver
    def attr(name: String): Attribute =
      child.output.find(a => resolver(a.name, name)).getOrElse(
        throw new IllegalArgumentException(
          s"column '$name' not in ${child.output.map(_.name).mkString(", ")}"))
    // resolve against the child here (names → the analyzed plan's attrs)
    // rather than leaning on analyzer behavior for a foreign node
    def resolved(e: Expression): Expression = e.transformUp {
      case u: UnresolvedAttribute => attr(u.name)
    }
    val keyExprs = keyCols.map(attr(_).asInstanceOf[Expression])
    // ColumnNodeToExpressionConverter eagerly rewrites the Column's node tree
    // to catalyst (internal.SortOrder → catalyst SortOrder); the lazy
    // ExpressionUtils wrapper would reach the executors unresolved
    val sortExprs = orderBy.map { c =>
      ColumnNodeToExpressionConverter(c.node) match {
        case so: SortOrder => resolved(so).asInstanceOf[SortOrder]
        case e => SortOrder(resolved(e), Ascending)
      }
    }
    Dataset.ofRows(
      df.sparkSession.asInstanceOf[ClassicSession],
      TopKPerKey(keyExprs, sortExprs, k, child))
  }
}
