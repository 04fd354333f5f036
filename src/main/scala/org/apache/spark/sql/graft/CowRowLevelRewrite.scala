package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, Cast, EqualTo, Expression, Literal, SubqueryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, InsertAction, LogicalPlan, MergeIntoTable, SubqueryAlias, UpdateAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.command.RunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** FILE-GRANULAR routing for SQL `UPDATE` / `MERGE INTO` on graft catalog
  * tables — the completion of the copy-on-write story for the SQL surface.
  *
  * Spark's group-based row-level framework rewrites UPDATE/MERGE into a
  * ReplaceData plan that reads and rewrites the WHOLE snapshot — correct,
  * but at 100 TB an UPDATE touching 0.01% of rows must not rewrite 100 TB.
  * [[graft.lake.CopyOnWrite]] already implements the file-granular form
  * (probe touched files, rewrite only those, carry the rest by manifest
  * reference, fold merge-on-read sidecars per the mutation rules); this
  * post-hoc resolution rule routes the SQL statements there whenever the
  * statement's shape is expressible:
  *
  *  - `UPDATE t SET c = expr, ... WHERE pred` — top-level column
  *    assignments, predicate/values referencing target columns only, no
  *    subqueries, deterministic;
  *  - `MERGE INTO t USING s ON t.k = s.k [AND ...]` with the clause shapes
  *    `WHEN MATCHED [AND cond] THEN DELETE`, `WHEN MATCHED THEN UPDATE SET
  *    ...`, `WHEN NOT MATCHED THEN INSERT *` (same-named, same-typed
  *    source columns) — key equalities on same-named columns, no
  *    `NOT MATCHED BY SOURCE` clauses, no schema evolution.
  *
  * Anything else falls through UNCHANGED to the group-based path, which
  * remains the full-semantics fallback (and is still O(snapshot), its
  * documented cost class). Observable semantics are identical either way —
  * the a26/a26b/a29 gates hash both paths against the same DuckDB oracle;
  * only the rewrite boundary (and therefore the commit cost) changes. In
  * particular both paths agree on SQL three-valued logic (rows mutate only
  * where the predicate IS TRUE) and on MERGE NULL-key behavior (an
  * equi-join key never matches NULL).
  *
  * The rewritten plan keeps the original relation (and MERGE source plan)
  * as CHILDREN of the command node, so analysis-time check rules
  * (ReadGuard, ReadAudit) still see every governed read — routing can
  * never launder a denied path. Escape hatch:
  * `SET spark.graft.sql.cowRouting=false` restores the group-based path
  * for every statement.
  */
/** Deliberately-unresolved wrapper around an UPDATE/MERGE condition. Its
  * one job is ORDERING: Spark's RewriteUpdateTable / RewriteMergeIntoTable
  * sit EARLIER in the Resolution batch than any injected rule and fire the
  * moment the command resolves, so a late rule can never claim the
  * statement first. Wrapping the condition keeps the command
  * `resolved == false` (deferring alignment and the group-based rewrite,
  * both of which require it) until [[CowRowLevelRewrite]] strips the
  * marker and either routes the statement to [[graft.lake.CopyOnWrite]]
  * or hands the untouched shape back for the group-based path to pick up
  * on the next fixed-point iteration. `synthetic` records a condition the
  * marker itself fabricated for a condition-less UPDATE, so stripping
  * restores `None` exactly.
  */
case class CowRoutePending(child: Expression, synthetic: Boolean)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.Unevaluable {
  override lazy val resolved: Boolean = false
  override def dataType: org.apache.spark.sql.types.DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The EARLY half of the routing: marks every top-level UPDATE / MERGE
  * before resolution starts (the Hints batch runs before Resolution), so
  * the built-in group-based rewrite cannot claim the statement out from
  * under [[CowRowLevelRewrite]]. Statements that end up not routable —
  * non-graft targets, unsupported shapes — are handed back unmarked and
  * take the built-in path one iteration later, so marking is never
  * observable beyond plan-shape timing.
  */
case class CowRouteMark(session: SparkSession) extends Rule[LogicalPlan] {
  private def enabled: Boolean =
    session.conf.get("spark.graft.sql.cowRouting", "true") != "false"

  /** `SET c = DEFAULT` resolves only inside Spark's alignment rule, which
    * requires the command resolved — exactly what the marker defers. Those
    * statements are left unmarked (group-based path) rather than wedged.
    */
  private def usesDefault(assigns: Seq[Assignment]): Boolean =
    assigns.exists(_.value.exists {
      case ua: UnresolvedAttribute => ua.name.equalsIgnoreCase("default")
      case _ => false
    })

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan match {
      case u: UpdateTable
          if !u.condition.exists(_.isInstanceOf[CowRoutePending]) &&
            !usesDefault(u.assignments) =>
        u.copy(condition = Some(u.condition match {
          case Some(c) => CowRoutePending(c, synthetic = false)
          case None => CowRoutePending(Literal.TrueLiteral, synthetic = true)
        }))
      case m: MergeIntoTable
          if !m.mergeCondition.isInstanceOf[CowRoutePending] &&
            !(m.matchedActions ++ m.notMatchedActions ++ m.notMatchedBySourceActions)
              .exists {
                case ua: UpdateAction => usesDefault(ua.assignments)
                case ia: InsertAction => usesDefault(ia.assignments)
                case _ => false
              } =>
        m.copy(mergeCondition = CowRoutePending(m.mergeCondition, synthetic = false))
      case other => other
    }
}

case class CowRowLevelRewrite(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case u: UpdateTable => u.condition match {
      case Some(mark: CowRoutePending) =>
        val stripped = u.copy(condition =
          if (mark.synthetic) None else Some(mark.child))
        // strip only once everything ELSE is resolved: routing needs the
        // final expression shapes, and a premature fallback would hand the
        // statement to the group-based rewrite before type coercion ran
        if (!stripped.resolved) u
        else rewriteUpdate(stripped).getOrElse(stripped)
      case _ => u
    }
    case m: MergeIntoTable => m.mergeCondition match {
      case mark: CowRoutePending =>
        val stripped = m.copy(mergeCondition = mark.child)
        if (!stripped.resolved) m
        else rewriteMerge(stripped).getOrElse(stripped)
      case _ => m
    }
    case other => other
  }

  private def unwrap(p: LogicalPlan): LogicalPlan = p match {
    case SubqueryAlias(_, child) => unwrap(child)
    case other => other
  }

  private def graftTarget(p: LogicalPlan): Option[(DataSourceV2Relation, GraftMutableTable)] =
    unwrap(p) match {
      case r: DataSourceV2Relation => r.table match {
        case g: GraftMutableTable => Some((r, g))
        case _ => None
      }
      case _ => None
    }

  /** Safe to re-express as a by-name Column: deterministic, no subqueries,
    * no aggregates (none of which the library mutation API evaluates).
    */
  private def translatable(e: Expression): Boolean =
    e.deterministic &&
      !e.exists(x => x.isInstanceOf[SubqueryExpression] ||
        x.isInstanceOf[AggregateExpression])

  /** Inline `With` common-expression nodes (BETWEEN and friends compile to
    * them): `With` computes `dataType` from its defs on every tree copy,
    * which throws once an UnresolvedAttribute lands inside. Duplicating
    * the common expression is sound here — translation requires
    * determinism — and the re-analysis of the library DataFrame
    * re-deduplicates whatever matters.
    */
  private def inlineWith(e: Expression): Expression = e.transformUp {
    case w: org.apache.spark.sql.catalyst.expressions.With =>
      val defs = w.defs.map(d => d.id -> d.child).toMap
      w.child.transformUp {
        case r: org.apache.spark.sql.catalyst.expressions.CommonExpressionRef =>
          defs(r.id)
      }
  }

  /** Re-express a resolved expression over the TARGET's attributes as a
    * Column resolving BY NAME against the library's own read of the table
    * (exprIds never survive into a fresh DataFrame). None = not routable.
    */
  private def targetColumn(e: Expression, target: AttributeSet): Option[Column] =
    if (!translatable(e) || !e.references.subsetOf(target)) None
    else Some(ExpressionUtils.column(inlineWith(e).transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    }))

  /** Same, for MERGE expressions spanning both sides: target attributes
    * become `t.<name>`, source attributes `s.<name>` (the alias contract
    * of [[graft.lake.CopyOnWrite.mergeInto]]).
    */
  private def twoSidedColumn(
      e: Expression, target: AttributeSet, source: AttributeSet): Option[Column] =
    if (!translatable(e) ||
        !e.references.subsetOf(target ++ source)) None
    else Some(ExpressionUtils.column(inlineWith(e).transform {
      case a: AttributeReference if target.contains(a) =>
        UnresolvedAttribute(Seq("t", a.name))
      case a: AttributeReference if source.contains(a) =>
        UnresolvedAttribute(Seq("s", a.name))
    }))

  /** An assignment the analyzer aligned to "column keeps its value". */
  private def isIdentity(a: Assignment): Boolean = (a.key, a.value) match {
    case (k: AttributeReference, v: AttributeReference) => v.exprId == k.exprId
    case (k: AttributeReference, Cast(v: AttributeReference, dt, _, _)) =>
      v.exprId == k.exprId && dt == k.dataType
    case _ => false
  }

  private def rewriteUpdate(u: UpdateTable): Option[LogicalPlan] =
    graftTarget(u.table).flatMap { case (rel, g) =>
      val tSet = AttributeSet(rel.output)
      val pred = targetColumn(u.condition.getOrElse(Literal.TrueLiteral), tSet)
      val sets = u.assignments.filterNot(isIdentity)
        .foldLeft(Option(Vector.empty[(String, Column)])) {
          case (Some(acc), a) => a.key match {
            case k: AttributeReference =>
              targetColumn(a.value, tSet).map(c => acc :+ (k.name -> c))
            case _ => None // nested-field assignment: group-based handles it
          }
          case (None, _) => None
        }
      (pred, sets) match {
        case (Some(p), Some(ss)) => Some(GraftCowMutation(
          Seq(rel), s"cow-update ${g.lakeTableName}",
          sess => graft.lake.CopyOnWrite.updateWhere(
            sess, g.lakeRoot, g.lakeTableName, p, ss)))
        case _ => None
      }
    }

  /** The merge condition as same-named key columns: a conjunction of
    * `t.k = s.k` equalities (bare attributes, either operand order).
    */
  private def mergeKeys(
      cond: Expression, target: AttributeSet,
      source: AttributeSet): Option[Seq[String]] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val keys = conjuncts(cond).map {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if target.contains(a) && source.contains(b) &&
            a.name.equalsIgnoreCase(b.name) => Some(a.name)
      case EqualTo(b: AttributeReference, a: AttributeReference)
          if target.contains(a) && source.contains(b) &&
            a.name.equalsIgnoreCase(b.name) => Some(a.name)
      case _ => None
    }
    if (keys.forall(_.isDefined) && keys.nonEmpty) {
      val names = keys.flatten
      if (names.distinct.size == names.size) Some(names) else None
    } else None
  }

  private def rewriteMerge(m: MergeIntoTable): Option[LogicalPlan] = {
    // withSchemaEvolution is fine to route: by the time this MERGE is
    // RESOLVED, ResolveMergeIntoSchemaEvolution has already pushed the
    // source-only columns through catalog.alterTable (metadata-only
    // Lake.addColumn commits) and reloaded the target relation — the
    // shapes below see the evolved schema like any other merge
    if (m.notMatchedBySourceActions.nonEmpty) return None
    graftTarget(m.targetTable).flatMap { case (rel, g) =>
      val tSet = AttributeSet(rel.output)
      val sSet = AttributeSet(m.sourceTable.output)
      val sTypes = m.sourceTable.output.map(a => a.exprId -> a.dataType).toMap
      mergeKeys(m.mergeCondition, tSet, sSet).flatMap { keys =>
        // matched clauses: optional conditional DELETE first, then an
        // unconditional UPDATE — the library's clause shapes exactly
        val matchedShapes: Option[(Option[Column], Option[Seq[(String, Column)]])] =
          m.matchedActions match {
            case Seq() => Some((None, Some(Seq.empty)))
            case Seq(DeleteAction(c)) =>
              val dc = c.map(twoSidedColumn(_, tSet, sSet))
                .getOrElse(Some(ExpressionUtils.column(Literal.TrueLiteral)))
              dc.map(col => (Some(col), Some(Seq.empty)))
            case Seq(UpdateAction(None, assigns, _)) =>
              translateSet(assigns, tSet, sSet).map(ss => (None, Some(ss)))
            case Seq(DeleteAction(Some(c)), UpdateAction(None, assigns, _)) =>
              for {
                dc <- twoSidedColumn(c, tSet, sSet)
                ss <- translateSet(assigns, tSet, sSet)
              } yield (Some(dc), Some(ss))
            case _ => None
          }
        // NOT MATCHED: absent, or INSERT * — every target column fed by a
        // same-named, SAME-TYPED source attribute (the library unions the
        // source's columns in verbatim; a needed cast bails to group-based)
        val insertShape: Option[Boolean] = m.notMatchedActions match {
          case Seq() => Some(false)
          case Seq(InsertAction(None, assigns)) =>
            val starLike = rel.output.forall { tc =>
              assigns.exists { a =>
                a.key match {
                  case k: AttributeReference if k.name == tc.name =>
                    a.value match {
                      case v: AttributeReference => sSet.contains(v) &&
                        v.name.equalsIgnoreCase(tc.name) &&
                        sTypes.get(v.exprId).contains(tc.dataType)
                      case _ => false
                    }
                  case _ => false
                }
              }
            }
            if (starLike) Some(true) else None
          case _ => None
        }
        (matchedShapes, insertShape) match {
          case (Some((delCond, Some(sets))), Some(ins)) =>
            val sourcePlan = m.sourceTable
            Some(GraftCowMutation(
              Seq(rel, sourcePlan), s"cow-merge ${g.lakeTableName}",
              sess => graft.lake.CopyOnWrite.mergeInto(
                sess, g.lakeRoot, g.lakeTableName,
                org.apache.spark.sql.classic.Dataset.ofRows(
                  sess.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
                  sourcePlan),
                keys,
                matchedDeleteCond = delCond,
                matchedSet = sets,
                insertNotMatched = ins)))
          case _ => None
        }
      }
    }
  }

  private def translateSet(
      assigns: Seq[Assignment], tSet: AttributeSet,
      sSet: AttributeSet): Option[Seq[(String, Column)]] =
    assigns.filterNot(isIdentity)
      .foldLeft(Option(Vector.empty[(String, Column)])) {
        case (Some(acc), a) => a.key match {
          case k: AttributeReference =>
            twoSidedColumn(a.value, tSet, sSet).map(c => acc :+ (k.name -> c))
          case _ => None
        }
        case (None, _) => None
      }
}

/** Eagerly-executed command driving a [[graft.lake.CopyOnWrite]] mutation.
  * The original relation (and MERGE source plan) stay as CHILDREN so
  * analysis-time check rules (ReadGuard / ReadAudit) still walk every
  * governed read; execution ignores the children — the library re-reads
  * the CURRENT latest version inside its own CAS retry loop, which is
  * also what makes a lost commit race retry instead of surfacing as
  * ConcurrentModificationException.
  */
case class GraftCowMutation(
    override val children: Seq[LogicalPlan], label: String,
    body: SparkSession => Int) extends LogicalPlan with RunnableCommand {
  override def output: Seq[Attribute] = Nil
  override def run(sparkSession: SparkSession): Seq[Row] = {
    body(sparkSession)
    Nil
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[LogicalPlan]): LogicalPlan =
    copy(children = newChildren)
  override def simpleString(maxFields: Int): String = s"GraftCowMutation $label"
}
