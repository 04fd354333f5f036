package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** MERGE-ON-READ position deletes over the versioned snapshot layout —
  * the delete-heavy complement of [[CopyOnWrite]] (the Iceberg-v2
  * position-delete idea applied to the version-directory layout).
  *
  * [[CopyOnWrite.deleteWhere]] rewrites every file that CONTAINS a match:
  * right when matches cluster, but a delete whose matches touch every
  * file (a sparse per-user GDPR erasure, a global quality cut) degenerates
  * to a full rewrite. Merge-on-read commits O(deleted rows) instead:
  *
  *  - the new version's dir holds NO data files — a `_manifest` carries
  *    every base file by reference, and a `_deletes/` parquet sidecar
  *    lists the deleted positions as `(file, pos)` rows, where `file` is
  *    the root-relative data-file path (`tables/<t>/version=vN/<part>`,
  *    always exactly four components — the spelling is root-relocatable)
  *    and `pos` is the row's parquet ordinal (`_metadata.row_index`,
  *    stable because committed files are immutable);
  *  - readers ([[Lake.readTableFeed]], catalog SQL — which routes
  *    delete-carrying versions through a V1Scan fallback) apply the
  *    sidecar as ONE anti-join on `(file, pos)` — the sidecar scales with
  *    deleted rows, not the table, so AQE broadcasts it while small and
  *    degrades to a shuffle join per the repo hint policy;
  *  - sidecars are CUMULATIVE and one-hop, like manifests: a delete on a
  *    delete-carrying base folds the base's sidecar into its own, so
  *    resolution never chains;
  *  - [[CopyOnWrite]] mutations on a delete-carrying base apply the
  *    sidecar when rewriting touched files (rewritten files' entries are
  *    dropped — their positions changed) and copy the carried files'
  *    entries forward — deleted rows can never resurrect;
  *  - [[Lake.compactTable]] (SQL: `CALL system.compact`) folds everything
  *    back to plain physical files, restoring full scan pushdown and
  *    letting retention reclaim the chain.
  *
  * The read-time anti-join is merge-on-read's documented price: a
  * delete-carrying version loses parquet filter pushdown on the catalog
  * path until compaction. Choose per workload — COW for read-heavy
  * tables, MOR + periodic compact for delete-heavy ones.
  */
object MergeOnRead {

  /** Per-version position-delete sidecar directory (underscore-prefixed:
    * Spark data readers never list it as data).
    */
  val deletesName = "_deletes"

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Root-relative data-file spelling from `_metadata.file_path` (a URI
    * string): the last four `/`-components are exactly
    * `tables/<t>/version=vN/<file>` — root-independent, so sidecars
    * survive a lake relocation like manifests do.
    */
  private[lake] def relFile(filePath: Column): Column = {
    val parts = split(filePath, "/")
    concat_ws("/", slice(parts, size(parts) - lit(3), lit(4)))
  }

  /** Does this version carry a position-delete sidecar? (resolved past
    * clone pointers, like every snapshot read)
    */
  def hasDeletes(
      spark: SparkSession, root: String, name: String, version: Int): Boolean = {
    val dir = Lake.resolveSnapshotDir(spark, root, name, version)
    fs(spark, dir).exists(new Path(dir, deletesName))
  }

  /** The version's `(file, pos)` sidecar, if any. */
  def deletesOf(
      spark: SparkSession, root: String, name: String,
      version: Int): Option[DataFrame] = {
    if (!hasDeletes(spark, root, name, version)) None
    else Some(spark.read.parquet(
      s"${Lake.resolveSnapshotDir(spark, root, name, version)}/$deletesName"))
  }

  /** Apply a position-delete sidecar to a raw parquet read of data
    * `files`: one anti-join on `(root-relative file, row ordinal)`. The
    * sidecar side is O(deleted rows) and deliberately UNHINTED — AQE
    * broadcasts it while it fits and falls back to a shuffle join when a
    * mass delete grows it (the repo-wide growth-class hint policy).
    */
  private[lake] def readWithDeletes(
      spark: SparkSession, files: Seq[String],
      deletes: Option[DataFrame]): DataFrame = {
    val base = spark.read.parquet(files: _*)
    deletes match {
      case None => base
      case Some(d) =>
        val cols = base.columns.map(col).toIndexedSeq
        base
          .withColumn("_g_file", relFile(col("_metadata.file_path")))
          .withColumn("_g_pos", col("_metadata.row_index"))
          .join(d, col("_g_file") === d("file") && col("_g_pos") === d("pos"),
            "left_anti")
          .select(cols: _*)
    }
  }

  /** MERGE-ON-READ DELETE: rows where `pred` IS TRUE are marked deleted in
    * a `(file, pos)` sidecar; NO data file is read back or rewritten — the
    * commit is O(deleted rows) regardless of how many files the matches
    * span (the case that degenerates [[CopyOnWrite.deleteWhere]] to a full
    * rewrite). The base version's sidecar (if any) folds into the new one,
    * so sidecars never chain. Commits through the same CAS every
    * read-modify-write uses; returns the new version.
    */
  def deleteWhere(
      spark: SparkSession, root: String, name: String, pred: Column,
      retentionVersions: Int = 7): Int =
    CopyOnWrite.retryLoop(name, "mor.deleteWhere") { () =>
      val base = Lake.latestVersion(spark, root, name).getOrElse(
        throw new IllegalStateException(s"no versions for table feed $name"))
      val files = Lake.snapshotFiles(spark, root, name, base)
      val baseDel = deletesOf(spark, root, name, base)
      // positions to delete: filter-pushed scan emitting ONLY (file, pos) —
      // a row already in the base sidecar that re-matches pred duplicates
      // an existing entry verbatim, so the union dedups structurally
      val matched = spark.read.parquet(files: _*)
        .filter(pred)
        .select(
          relFile(col("_metadata.file_path")).as("file"),
          col("_metadata.row_index").as("pos"))
      val cumulative = baseDel
        .map(d => matched.unionByName(d)).getOrElse(matched)
        .distinct()
      val tdir = Lake.tablePath(root, name)
      val stage = new Path(
        s"$tdir/.stage_${java.util.UUID.randomUUID().toString.replace("-", "")}")
      cumulative.write.mode(SaveMode.Overwrite)
        .parquet(new Path(stage, deletesName).toString)
      val f = fs(spark, tdir)
      val rels = files.map(CopyOnWrite.relToRoot(root, _))
      // a MOR delete on a shallow-cloned branch carries the SOURCE's files:
      // pin their dirs against the source's retention, like every other
      // manifest-writing commit
      CopyOnWrite.pinForeign(f, root, name, rels)
      val out = f.create(new Path(stage, Lake.manifestName), true)
      try out.write(rels.mkString("\n").getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      Lake.promoteStagedIf(spark, root, name, stage, base, retentionVersions)
    }
}
