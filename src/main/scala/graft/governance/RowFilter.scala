package graft.governance

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.BooleanType

/** Row-level security as an injected Catalyst rule — the row-granular
  * member of the governance triple: [[ReadGuard]] decides whether a
  * principal may read a path at all, [[ColumnMask]] rewrites WHAT each
  * column shows, and this rule decides WHICH ROWS a read returns. The
  * reference approximates this with per-feed blacklist streams
  * (data_lake_config.py:70-86 materializes a filtered twin the consumer
  * must choose); here there is one table and the engine appends the
  * policy predicate to every read of it while a policy set is installed.
  *
  * Mechanics: each covered file-backed relation is wrapped, once, in a
  * `Filter(policyPredicate, relation)`. The predicate arrives as SQL
  * text, is parsed by the session parser and resolved + type-coerced by
  * the session ANALYZER against exactly that relation's output (running
  * the analyzer on the one-node subtree applies the same implicit casts
  * a user query would get, without re-running analysis check rules).
  * Fail-closed: a predicate that does not resolve to a BOOLEAN over the
  * relation's columns — wrong column name, unresolvable function,
  * non-boolean result — refuses the read instead of serving unfiltered
  * rows, and reads of a covered path through a non-wrappable relation
  * kind (a DataSourceV2 connector) are refused the same way.
  *
  * Composition with [[ColumnMask]]: both rules rewrite the relation leaf,
  * so the RLS Filter lands DIRECTLY above the relation — beneath any mask
  * projection. Policy predicates therefore evaluate on RAW values (the
  * admin-written tenant predicate filters true tenant ids) while the
  * analyst still sees masked columns; the mask can never hide a row from
  * the filter, and the filter can never leak a raw value upward (the mask
  * projection still covers everything above it).
  *
  * Scale shape: the added Filter sits on the scan leaf, so the normal
  * optimizer batches push it into the parquet reader like any user
  * predicate — PushedFilters carries the policy (pinned in PLANS), row
  * groups that cannot match are skipped via footer stats, and no extra
  * job, shuffle, or plan barrier is introduced. RLS at 100 TB costs what
  * the predicate costs, not a post-scan pass.
  */
object RowFilter {

  /** One policy: rows of every table under `pathPrefix` are visible only
    * where `predicateSql` (SQL over that table's columns) holds. Multiple
    * covering policies AND together.
    */
  final case class Policy(pathPrefix: String, predicateSql: String) {
    private[governance] val norm: String =
      new org.apache.hadoop.fs.Path(pathPrefix).toUri.getPath
  }

  @volatile private var active: Seq[Policy] = Nil

  private val filtered = TreeNodeTag[Boolean]("graft.rowFilter.applied")

  /** True when some active policy covers `path` — consulted by
    * [[graft.warehouse.SummaryRewrite]]: a pre-aggregated summary was
    * built over ALL rows, so it can never answer for a row-filtered base.
    */
  def protects(path: String): Boolean = covering(path).nonEmpty

  /** Install for the principals whose reads must be filtered; clear for
    * trusted ones — the same install/clear composition as [[ReadGuard]]
    * and [[ColumnMask]].
    */
  def install(policies: Seq[Policy]): Unit = active = policies

  def clear(): Unit = active = Nil

  private def covering(path: String): Seq[Policy] =
    active.filter(p => path == p.norm || path.startsWith(p.norm + "/"))

  /** Parse + resolve one policy predicate against `lr`'s output via the
    * session analyzer (resolution AND type coercion), fail-closed.
    */
  private def resolved(session: SparkSession, pol: Policy,
      lr: LogicalRelation): org.apache.spark.sql.catalyst.expressions.Expression = {
    val parsed =
      try session.sessionState.sqlParser.parseExpression(pol.predicateSql)
      catch {
        case e: Exception => throw new SecurityException(
          s"row-filter policy on ${pol.pathPrefix} does not parse: " +
            s"${pol.predicateSql} (${e.getMessage})")
      }
    val analyzed =
      try session.sessionState.analyzer.execute(Filter(parsed, lr))
      catch {
        case e: Exception => throw new SecurityException(
          s"row-filter policy on ${pol.pathPrefix} does not resolve against " +
            s"columns ${lr.output.map(_.name).mkString(",")}: " +
            s"${pol.predicateSql} (${e.getMessage})")
      }
    analyzed match {
      case Filter(cond, _) if cond.resolved && cond.dataType == BooleanType => cond
      case _ => throw new SecurityException(
        s"row-filter policy on ${pol.pathPrefix} is not a boolean predicate " +
          s"over the table's columns: ${pol.predicateSql}")
    }
  }

  /** The injected rule (see [[graft.GraftExtensions]]). */
  def rule(session: SparkSession): Rule[LogicalPlan] = new Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      if (active.isEmpty) plan
      else plan.transformUp {
        case lr: LogicalRelation if lr.getTagValue(filtered).isEmpty =>
          lr.relation match {
            case fs: HadoopFsRelation =>
              val pols = fs.location.rootPaths.map(_.toUri.getPath)
                .flatMap(covering).distinct
              if (pols.isEmpty) lr
              else {
                lr.setTagValue(filtered, true)
                val cond = pols.map(resolved(session, _, lr))
                  .reduce(org.apache.spark.sql.catalyst.expressions.And(_, _))
                Filter(cond, lr)
              }
            case _ => lr
          }
        case v2: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
          // shared extractor: singular path, plural paths (JSON array from
          // multi-path loads) AND name-addressed catalog tables — a miss
          // here is a silent fail-open through that read shape
          RelationPaths.of(v2).filter(p => covering(p).nonEmpty).foreach { p =>
            throw new SecurityException(
              s"row-filter policy covers $p but the read uses a non-filterable " +
                "relation; use the file source or clear the policy")
          }
          v2
        case imr: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
          // cache substitution replaces the file relation BEFORE this rule
          // runs, so a pre-policy cache would serve covered rows unfiltered;
          // walk the cached physical plan's scans and refuse — fail closed
          RelationPaths.cachedPlanPaths(imr.cacheBuilder.cachedPlan)
            .filter(p => covering(p).nonEmpty).foreach { p =>
              throw new SecurityException(
                s"row-filter policy covers $p but the data is served from a " +
                  "pre-policy cache; uncache the table or clear the policy")
            }
          imr
      }
  }
}
