package graft.governance

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Cast, EvalMode, Literal, NamedExpression, Sha2}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{BinaryType, StringType}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Column-level masking as an injected Catalyst rule — the column-granular
  * complement of [[ReadGuard]]'s all-or-nothing path enforcement, and the
  * in-engine version of the reference's detached anonymization feed
  * (data_lake_config.py:60-68 materializes `user_transactions_anonymized`
  * as a SEPARATE ksqlDB stream; consumers must choose the right one).
  * Here there is one table and the engine rewrites reads of it: while a
  * policy set is installed, every file-backed relation under a protected
  * path prefix is wrapped in a Project that replaces each protected
  * column, in place and under its own exprId, with
  *
  *  - '''pseudonym''': `sha2(col, 256)` — deterministic, so joins and
  *    GROUP BYs on the masked column still work (the b3 anonymize
  *    semantics), or
  *  - '''redact''': a typed NULL literal.
  *
  * The masked columns get FRESH exprIds and the rewrite runs through
  * `transformUpWithNewOutput`, which re-points every upstream reference —
  * filters, joins, aggregates the analyst wrote — at the masked
  * definition. (Re-aliasing under the ORIGINAL exprId would shadow one
  * exprId with two definitions, which Catalyst treats as a no-op
  * projection — `RemoveNoopOperators` would silently strip the mask.)
  * Predicate pushdown through the mask Project is leak-free by
  * construction: Catalyst pushes a filter through a Project by
  * SUBSTITUTING the alias definition, so a predicate on a protected
  * column becomes a predicate on the masked value, never on the raw
  * column. The rule runs in the fixed-point operator-optimization batch;
  * wrapped relations are tagged so the second pass is a no-op.
  *
  * Scale shape: masking is a per-row projection fused into whole-stage
  * codegen directly over the scan — zero extra jobs, zero extra shuffles,
  * and column pruning still reaches the parquet footer (a query that never
  * touches the protected column never decodes it).
  */
object ColumnMask {

  sealed trait Action
  /** Replace with sha2(col, 256) — join/group-stable pseudonym. */
  case object Pseudonym extends Action
  /** Replace with a typed NULL. */
  case object Redact extends Action

  /** One policy: protect `column` on every table under `pathPrefix`. */
  final case class Policy(pathPrefix: String, column: String, action: Action) {
    private[governance] val norm: String =
      new org.apache.hadoop.fs.Path(pathPrefix).toUri.getPath
  }

  @volatile private var active: Seq[Policy] = Nil

  private val masked = TreeNodeTag[Boolean]("graft.columnMask.applied")

  /** True when some active policy covers `path` — consulted by
    * [[graft.warehouse.SummaryRewrite]] so a pre-aggregated summary can
    * never serve raw values of a protected base table.
    */
  def protects(path: String): Boolean = covering(path).nonEmpty

  /** Start masking: every subsequently-analyzed plan in this JVM session
    * has the policies applied. Sessions with no installed policies are
    * untouched. Install for the principals that need masking (the
    * analyst's session); clear for trusted ones — the same
    * install/clear composition [[ReadGuard]] uses.
    */
  def install(policies: Seq[Policy]): Unit = active = policies

  def clear(): Unit = active = Nil

  private def covering(path: String): Seq[Policy] =
    active.filter(p => path == p.norm || path.startsWith(p.norm + "/"))

  private def maskExpr(a: Attribute, action: Action): NamedExpression = {
    val e = action match {
      case Pseudonym if a.dataType == StringType =>
        // post-analysis, so the string→binary implicit cast the analyzer
        // would insert for sha2() is spelled out explicitly
        Sha2(Cast(a, BinaryType, None, EvalMode.fromSQLConf(SQLConf.get)), Literal(256))
      case Pseudonym =>
        // a pseudonym must keep the column's type (the replacement slots
        // into operators analyzed against it); for non-strings fall back
        // to the strictly-safer typed NULL
        Literal(null, a.dataType)
      case Redact => Literal(null, a.dataType)
    }
    // fresh exprId: transformUpWithNewOutput rewires upstream references
    Alias(e, a.name)(qualifier = a.qualifier)
  }

  /** The injected rule (see [[graft.GraftExtensions]]). Fail-closed
    * boundary: the in-place rewrite covers v1 file relations (including the
    * per-micro-batch relations Structured Streaming file sources plan);
    * reads of a PROTECTED path through any OTHER relation kind (e.g. a
    * DataSourceV2 connector) are REFUSED rather than silently served raw —
    * a masking policy must never depend on which connector a reader picked.
    */
  def rule(session: SparkSession): Rule[LogicalPlan] = new Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      if (active.isEmpty) plan
      else plan.transformUpWithNewOutput {
        case lr: LogicalRelation if lr.getTagValue(masked).isEmpty =>
          lr.relation match {
            case fs: HadoopFsRelation =>
              val pols = fs.location.rootPaths.map(_.toUri.getPath).flatMap(covering).distinct
              if (pols.isEmpty) lr -> Nil
              else {
                // case-insensitive column match (Spark's default resolution
                // is case-insensitive; a case-mismatched policy must still
                // mask). A covering policy whose column is absent from the
                // relation is a policy error — refuse, never serve raw.
                val byCol = pols.map(p => p.column.toLowerCase -> p.action).toMap
                val present = lr.output.map(_.name.toLowerCase).toSet
                val missing = byCol.keySet.diff(present)
                if (missing.nonEmpty) throw new SecurityException(
                  s"column-mask policy names column(s) $missing absent from " +
                    s"${fs.location.rootPaths.mkString(",")}; fix or clear the policy")
                lr.setTagValue(masked, true)
                val projList = lr.output.map(a =>
                  byCol.get(a.name.toLowerCase).map(maskExpr(a, _)).getOrElse(a))
                val proj = Project(projList, lr)
                val remapped = lr.output.zip(proj.output)
                  .filter { case (old, nw) => old.exprId != nw.exprId }
                proj -> remapped
              }
            case _ => lr -> Nil
          }
        case v2: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
          // shared extractor: singular path, plural paths (JSON array from
          // multi-path loads) AND name-addressed catalog tables
          RelationPaths.of(v2).filter(p => covering(p).nonEmpty).foreach { p =>
            throw new SecurityException(
              s"column-mask policy covers $p but the read uses a non-maskable " +
                "relation; use the file source or clear the policy")
          }
          v2 -> Nil
        case imr: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
          // a pre-policy cache holds RAW column values; serving it would
          // bypass the mask entirely — refuse, fail closed
          RelationPaths.cachedPlanPaths(imr.cacheBuilder.cachedPlan)
            .filter(p => covering(p).nonEmpty).foreach { p =>
              throw new SecurityException(
                s"column-mask policy covers $p but the data is served from a " +
                  "pre-policy cache; uncache the table or clear the policy")
            }
          imr -> Nil
      }
  }
}
