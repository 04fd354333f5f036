package graft.governance

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{Generate, LogicalPlan, Union}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Column-level lineage, extracted from the analyzed plan — the governance
  * metadata the reference keeps only implicitly (its feed configs name
  * source streams per feed, data_lake_config.py:46-120, but nothing maps a
  * warehouse COLUMN back to the stream field it came from). Here the
  * Catalyst plan IS the lineage graph: one driver-side walk, zero jobs.
  *
  * For every output column of a query, emits one row per contributing
  * (source_table, source_column) leaf — the transitive closure of
  * attribute references through Project/Aggregate/Window/Generate aliases,
  * joins, unions and filters down to file-backed relations (table =
  * basename of the scan path). This is DATA lineage: a column's sources
  * are the leaves its VALUE expression references; filter/join predicates
  * that select rows without feeding the value are not counted. Outputs
  * derived from no source column (e.g. `count(*)`, literals) emit one row
  * with NULL source — absence of lineage is itself the finding.
  *
  * At 100 TB this is the piece that makes [[ColumnMask]]/[[Permissions]]
  * auditable: "which outputs of this report derive from a protected
  * column" is a metadata query, not a data scan.
  */
object Lineage {

  private def tableName(path: String): String = {
    val base = path.stripSuffix("/").split('/').last
    val dot = base.lastIndexOf('.')
    if (dot > 0) base.substring(0, dot) else base
  }

  /** (output_column, source_table, source_column) edges, sorted. */
  def columnLineage(s: SparkSession, df: DataFrame): DataFrame = {
    val plan = df.queryExecution.analyzed
    val sources = scala.collection.mutable.Map.empty[Long, Set[(String, String)]]
    def lookup(id: Long): Set[(String, String)] = sources.getOrElse(id, Set.empty)
    def walk(p: LogicalPlan): Unit = {
      p.children.foreach(walk)
      p match {
        case lr: LogicalRelation =>
          lr.relation match {
            case fs: HadoopFsRelation =>
              val t = tableName(fs.location.rootPaths.head.toUri.getPath)
              lr.output.foreach(a => sources(a.exprId.id) = Set((t, a.name)))
            case _ =>
              // a data-bearing leaf we can't name (e.g. JDBC): its columns
              // DO carry source data — mark them opaque, never source-free
              // (a NULL edge must mean "derives from no input column")
              lr.output.foreach(a => sources(a.exprId.id) = Set(("<opaque>", a.name)))
          }
        case v2: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
          val t = Option(v2.options.get("path"))
            .map(raw => tableName(new org.apache.hadoop.fs.Path(raw).toUri.getPath))
            .getOrElse("<opaque>")
          v2.output.foreach(a => sources(a.exprId.id) = Set((t, a.name)))
        case g: Generate =>
          // explode/posexplode etc: every generated column derives from the
          // generator's inputs
          val from = g.generator.references.toSeq
            .flatMap(r => lookup(r.exprId.id)).toSet
          g.generatorOutput.foreach(a => sources(a.exprId.id) = from)
          collectAliases(p)
        case u: Union =>
          // union output borrows the first child's exprIds but its VALUES
          // come from every branch — merge positionally
          u.output.zipWithIndex.foreach { case (a, i) =>
            sources(a.exprId.id) =
              u.children.flatMap(c => lookup(c.output(i).exprId.id)).toSet
          }
          collectAliases(p)
        case _ => collectAliases(p)
      }
    }
    def collectAliases(p: LogicalPlan): Unit =
      p.expressions.foreach(_.foreach {
        case al: Alias =>
          sources(al.exprId.id) =
            al.child.references.toSeq.flatMap(r => lookup(r.exprId.id)).toSet
        case _ => ()
      })
    walk(plan)
    val rows = plan.output.flatMap { a =>
      val srcs = lookup(a.exprId.id)
      if (srcs.isEmpty) Seq(Row(a.name, null, null))
      else srcs.toSeq.sorted.map { case (t, c) => Row(a.name, t, c) }
    }
    val schema = StructType(Seq(
      StructField("output_column", StringType, nullable = false),
      StructField("source_table", StringType, nullable = true),
      StructField("source_column", StringType, nullable = true)))
    s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }
}
