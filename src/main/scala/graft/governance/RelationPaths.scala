package graft.governance

import scala.util.Try

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** ONE answer to "which file paths does this plan node read" — shared by
  * every path-keyed governance rule ([[ReadGuard]], [[ReadAudit]],
  * [[RowFilter]], [[ColumnMask]]). Each rule previously hand-rolled its
  * own subset and the misses were exactly the security holes: a relation
  * kind one rule knew about and another didn't was a bypass of the second
  * rule. Covered here:
  *
  *  - v1 file relations (`HadoopFsRelation` root paths);
  *  - DataSourceV2 relations: the singular `path` option, the plural
  *    `paths` option (a JSON array — `DataFrameReader.load(p1, p2)` stores
  *    it this way, and checking only `path` let multi-path loads through),
  *    and catalog tables implementing
  *    [[org.apache.spark.sql.graft.GovernedPath]] (name-addressed reads
  *    carry no path option at all — the catalog table itself declares the
  *    directory it serves);
  *  - streaming leaves (`StreamingRelation` v1, `StreamingRelationV2`),
  *    which the analyzed plan of every `readStream` contains.
  */
object RelationPaths {

  def norm(raw: String): String = new org.apache.hadoop.fs.Path(raw).toUri.getPath

  private def jsonArray(s: String): Seq[String] =
    Try(new com.fasterxml.jackson.databind.ObjectMapper()
      .readValue(s, classOf[Array[String]]).toSeq).getOrElse(Nil)

  private def optionPaths(o: org.apache.spark.sql.util.CaseInsensitiveStringMap): Seq[String] =
    Option(o.get("path")).toSeq.map(norm) ++
      Option(o.get("paths")).toSeq.flatMap(jsonArray).map(norm)

  /** File paths behind one logical plan NODE (callers walk the plan). */
  def of(node: LogicalPlan): Seq[String] = node match {
    case lr: LogicalRelation =>
      lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.toSeq.map(_.toUri.getPath)
        case _ => Nil
      }
    case v2: DataSourceV2Relation =>
      v2.table match {
        case g: org.apache.spark.sql.graft.GovernedPath => Seq(norm(g.governedPath))
        case _ => optionPaths(v2.options)
      }
    case sv2: org.apache.spark.sql.catalyst.streaming.StreamingRelationV2 =>
      Option(sv2.extraOptions.get("path")).toSeq.map(norm) ++
        Option(sv2.extraOptions.get("paths")).toSeq.flatMap(jsonArray).map(norm)
    case sr: org.apache.spark.sql.execution.streaming.runtime.StreamingRelation =>
      (sr.dataSource.paths ++ sr.dataSource.options.get("path")).map(norm)
    case _ => Nil
  }

  /** Is this node a DataSourceV2 relation (the kind the rewrite rules
    * cannot wrap in place and must refuse when covered)?
    */
  def isV2(node: LogicalPlan): Boolean = node.isInstanceOf[DataSourceV2Relation]

  /** File paths scanned by a CACHED physical plan — cache substitution
    * replaces file relations with `InMemoryRelation` before optimization,
    * so rewrite rules never see the underlying scan; walking the cached
    * plan is how a policy rule stays fail-closed against pre-policy
    * caches. Descends through the AQE wrapper (whose `children` is Nil).
    */
  def cachedPlanPaths(plan: SparkPlan): Seq[String] = {
    val expanded = plan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.inputPlan
      case p => p
    }
    expanded.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.rootPaths.toSeq.map(_.toUri.getPath)
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.table match {
          case g: org.apache.spark.sql.graft.GovernedPath => Seq(norm(g.governedPath))
          case _ => Nil
        }
    }.flatten
  }
}
