package graft.governance

import java.sql.Date

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions._

/** Analysis-time read enforcement of the C4 permission catalog — the
  * governance table stops being advisory and becomes a Catalyst CHECK RULE
  * (`SparkSessionExtensions.injectCheckRule`): while a principal is
  * installed, every analyzed plan is walked and any file-backed relation
  * (v1 `HadoopFsRelation` root paths, v2 relations with a `path` option)
  * whose location is not under one of the principal's active, unexpired
  * read/admin grants fails the query BEFORE execution — no partial scans,
  * no leaked rows, and the denial carries the offending path.
  *
  * The grant set is SNAPSHOTTED at install (one collect of the principal's
  * folder prefixes — bounded by the catalog, which is dimension-sized), so
  * the per-query check is pure string prefix matching on the driver: zero
  * jobs added to the analysis path. Sessions with no installed principal
  * are untouched (the rule no-ops), which is what keeps the gate harness
  * and the guard composable in one session.
  */
object ReadGuard {

  @volatile private var active: Option[(String, Seq[String])] = None

  /** Snapshot `principal`'s active, unexpired read-capable grants (via the
    * shared [[Permissions.readableFolders]] — one source of truth with
    * `check`/`checkBatch`) and start enforcing them on every subsequent
    * analyzed plan in this JVM session.
    */
  def install(perms: DataFrame, principal: String, asOf: Date): Unit =
    active = Some((principal, Permissions.readableFolders(perms, principal, asOf)))

  def clear(): Unit = active = None

  private def permitted(path: String, prefixes: Seq[String]): Boolean =
    prefixes.exists(f => f.isEmpty || path == f || path.startsWith(f + "/"))

  private def deny(principal: String, path: String): Nothing =
    throw new SecurityException(
      s"read denied: principal $principal has no active read grant covering $path")

  /** The injected check rule: runs after analysis, throws to reject. The
    * relation walk is the shared [[RelationPaths]] extractor — v1 file
    * relations, v2 relations (path/paths options and name-addressed
    * catalog tables via `GovernedPath`), and both streaming leaf kinds
    * (skipping any would bypass the guard for that read shape).
    */
  def checkRule(session: SparkSession): LogicalPlan => Unit = plan =>
    active.foreach { case (principal, prefixes) =>
      plan.foreach { node =>
        RelationPaths.of(node).foreach { up =>
          if (!permitted(up, prefixes)) deny(principal, up)
        }
      }
    }
}
