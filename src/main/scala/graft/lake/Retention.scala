package graft.lake

import java.time.LocalDate

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Retention / GC (SURVEY.md §2.C1-C3, data_retention.py).
  *
  * Pure partition-directory operations — deletion cost is O(partitions), no
  * data scan, which is what makes retention viable on a 100 TB lake. Both
  * entry points support `dryRun` (data_retention.py:41-42, 73-75).
  */
object Retention {

  case class Pruned(path: String, deleted: Boolean)

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Delete day partitions older than `cutoff` (exclusive) for a stream feed
    * (C1, data_retention.py:13-51). Empty month/year parents are pruned too.
    * Returns the affected day-partition paths.
    */
  def pruneStreamPartitions(
      spark: SparkSession, root: String, name: String,
      cutoff: LocalDate, dryRun: Boolean = false): Seq[Pruned] = {
    val base = Lake.streamPath(root, name)
    val f = fs(spark, base)
    if (!f.exists(new Path(base))) return Seq.empty
    val PartDate = raw".*/year=(\d+)/month=(\d+)/day=(\d+)$$".r
    val dayDirs = for {
      y <- f.listStatus(new Path(base)).toSeq if y.isDirectory
      m <- f.listStatus(y.getPath).toSeq if m.isDirectory
      d <- f.listStatus(m.getPath).toSeq if d.isDirectory
    } yield d.getPath
    val old = dayDirs.flatMap { p =>
      p.toString match {
        case PartDate(y, m, d) =>
          val dt = LocalDate.of(y.toInt, m.toInt, d.toInt)
          if (dt.isBefore(cutoff)) Some(p) else None
        case _ => None
      }
    }
    val out = old.map { p =>
      if (!dryRun) f.delete(p, true)
      Pruned(p.toString, deleted = !dryRun)
    }
    if (!dryRun) {
      // prune now-empty month/year parents (data_retention.py:44-49)
      for {
        y <- f.listStatus(new Path(base)).toSeq if y.isDirectory
        m <- f.listStatus(y.getPath).toSeq if m.isDirectory
      } if (f.listStatus(m.getPath).isEmpty) f.delete(m.getPath, false)
      f.listStatus(new Path(base)).toSeq
        .filter(s => s.isDirectory && f.listStatus(s.getPath).isEmpty)
        .foreach(s => f.delete(s.getPath, false))
    }
    out.sortBy(_.path)
  }

  /** Keep the newest `keep` versions of a table feed, delete the rest (C2,
    * data_retention.py:54-78). No-op when versions ≤ keep (:65-67).
    * Versions carrying a `_pin_*` marker (a shallow clone references their
    * bytes — [[Lake.cloneTable]]) are NOT prunable: deleting them would
    * dangle every branch pointing here. They are excluded from the result
    * entirely — they are not "kept by recency", they are ineligible.
    */
  def pruneTableVersions(
      spark: SparkSession, root: String, name: String,
      keep: Int, dryRun: Boolean = false): Seq[Pruned] = {
    val vs = Lake.versions(spark, root, name)
    if (vs.size <= keep) return Seq.empty
    val f = fs(spark, Lake.tablePath(root, name))
    vs.dropRight(keep).flatMap { v =>
      val p = new Path(s"${Lake.tablePath(root, name)}/version=v$v")
      val pinned = f.listStatus(p).exists(_.getPath.getName.startsWith("_pin_"))
      if (pinned) None
      else {
        if (!dryRun) f.delete(p, true)
        Some(Pruned(p.toString, deleted = !dryRun))
      }
    }
  }
}
