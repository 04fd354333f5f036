package org.apache.spark.sql.graft

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A DataSource V2 `TableCatalog` over the graft versioned lake — the
  * SQL-addressable front door to `graft.lake.Lake`'s snapshot tables
  * (`<root>/tables/<name>/version=vN/`, Lake.scala:14). The reference
  * exposes its tables by NAME through ksqlDB/MySQL (data_lake_config.py
  * feed names, sync_to_mysql.py table DDL); this catalog restores that
  * surface on Spark's own catalog API:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
  *   spark.conf.set("spark.sql.catalog.graft.root", "/lake")
  *   spark.sql("SELECT * FROM graft.tables.user_summary")                 // latest
  *   spark.sql("SELECT * FROM graft.tables.user_summary VERSION AS OF 1") // pinned
  *   spark.sql("... TIMESTAMP AS OF '2026-01-01 00:00:00'")               // as-of
  * }}}
  *
  * Time travel rides the catalog API itself (`loadTable(ident, version)` /
  * `(ident, timestampMicros)`): `VERSION AS OF n` resolves `version=vn`,
  * `TIMESTAMP AS OF t` resolves the newest snapshot COMMITTED at or before
  * `t` (commit time = the claim-rename instant recorded by the snapshot
  * directory's modification time — monotone per table because versions
  * commit sequentially through the OCC claim protocol).
  *
  * Reads plan through Spark's own `ParquetTable`, so the catalog inherits
  * the full scan machinery — vectorized reader, filter pushdown, column
  * pruning, partition discovery — identical to a path-based read of the
  * same snapshot; the catalog only resolves names to directories (a
  * driver-side FS listing, no jobs). Writes stay on the library API
  * ([[graft.lake.Lake.writeTableSnapshot]]), which owns the versioning and
  * OCC claim protocol — `createTable`/`dropTable` through SQL would bypass
  * the snapshot contract, so they refuse loudly instead of corrupting it.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = options.get("root")
    require(root != null, s"catalog $name needs option 'root' (the lake root dir)")
  }

  override def name(): String = catalogName

  // -- namespaces: the single `tables` namespace of the Lake layout --

  override def listNamespaces(): Array[Array[String]] = Array(Array("tables"))

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.sameElements(Array("tables"))

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    if (namespaceExists(namespace)) util.Collections.emptyMap()
    else throw new NoSuchNamespaceException(namespace)

  override def createNamespace(namespace: Array[String], metadata: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException("graft namespaces are fixed by the lake layout")

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft namespaces are fixed by the lake layout")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException("graft namespaces are fixed by the lake layout")

  // -- tables --

  private def tableDir(ident: Identifier): Path =
    new Path(s"$root/${ident.namespace().mkString("/")}/${ident.name()}")

  private def fs(p: Path) =
    p.getFileSystem(SparkSession.active.sessionState.newHadoopConf())

  /** (version, commitMillis) pairs of a table, ascending by version. */
  private def snapshots(ident: Identifier): Seq[(Int, Long)] = {
    val dir = tableDir(ident)
    val f = fs(dir)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("version=v"))
      .map(s => (s.getPath.getName.stripPrefix("version=v").toInt,
        s.getModificationTime))
      .sortBy(_._1)
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    val dir = new Path(s"$root/${namespace.mkString("/")}")
    val f = fs(dir)
    if (!f.exists(dir)) Array.empty
    else f.listStatus(dir).filter(_.isDirectory)
      .map(s => Identifier.of(namespace, s.getPath.getName))
  }

  override def tableExists(ident: Identifier): Boolean = snapshots(ident).nonEmpty

  private def parquetTable(ident: Identifier, version: Int): Table = {
    val dir = s"${tableDir(ident)}/version=v$version"
    ParquetTable(
      s"$catalogName.${ident.namespace().mkString(".")}.${ident.name()}@v$version",
      SparkSession.active,
      CaseInsensitiveStringMap.empty(),
      Seq(dir),
      None,
      classOf[ParquetFileFormat])
  }

  override def loadTable(ident: Identifier): Table = {
    val snaps = snapshots(ident)
    if (snaps.isEmpty) throw new NoSuchTableException(ident)
    parquetTable(ident, snaps.last._1)
  }

  /** `VERSION AS OF n` (also accepts `vn`). */
  override def loadTable(ident: Identifier, version: String): Table = {
    val v = version.stripPrefix("v").toInt
    val snaps = snapshots(ident)
    if (snaps.isEmpty) throw new NoSuchTableException(ident)
    if (!snaps.exists(_._1 == v)) throw new NoSuchTableException(
      Seq(s"${ident.name()} (has versions ${snaps.map(_._1).mkString(",")}, not v$v)"))
    parquetTable(ident, v)
  }

  /** `TIMESTAMP AS OF t` (micros since epoch): newest snapshot committed
    * at or before `t`.
    */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val snaps = snapshots(ident)
    if (snaps.isEmpty) throw new NoSuchTableException(ident)
    val eligible = snaps.filter(_._2 * 1000L <= timestampMicros)
    if (eligible.isEmpty) throw new NoSuchTableException(
      Seq(s"${ident.name()} (no snapshot at or before timestamp $timestampMicros)"))
    parquetTable(ident, eligible.map(_._1).max)
  }

  override def createTable(
      ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "graft tables are written via Lake.writeTableSnapshot (snapshot+OCC contract)")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "graft tables are written via Lake.writeTableSnapshot (snapshot+OCC contract)")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(
      "graft tables are retired via Retention.pruneTableVersions / Lake.vacuumTable")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "graft tables are written via Lake.writeTableSnapshot (snapshot+OCC contract)")
}
