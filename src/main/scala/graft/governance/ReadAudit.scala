package graft.governance

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Read AUDITING — the third leg of the governance loop the reference
  * sketches with scattered log statements (manage_permissions.py logs
  * grants, the consumers log their own reads): [[Permissions]] grants,
  * [[ReadGuard]]/[[RowFilter]]/[[ColumnMask]] enforce, and this rule
  * RECORDS. While a principal is installed, every analyzed plan is walked
  * (the same `injectCheckRule` hook as ReadGuard, so nothing can be
  * planned without passing through it) and each file-backed relation —
  * v1 root paths and v2 `path`-option relations alike — appends one
  * (seq, principal, path) entry to the audit log. Recording at ANALYSIS
  * time is the right hook for an audit: it fires before any execution,
  * captures reads that later fail or are cancelled (attempts are exactly
  * what an auditor wants), and adds zero jobs to the query itself.
  *
  * The in-memory buffer is the session-local collection point; at scale
  * the flush target is a versioned lake table (`Lake.writeTableSnapshot`
  * of `log()`), turning audit review into a plain query — who planned
  * reads of which path, in which order. Driver-side cost per query is the
  * relation walk: O(plan nodes), no Spark jobs.
  */
object ReadAudit {

  final case class Entry(seq: Long, principal: String, path: String)

  private val buf = new java.util.concurrent.ConcurrentLinkedQueue[Entry]()
  private val seq = new java.util.concurrent.atomic.AtomicLong(0L)

  @volatile private var active: Option[String] = None

  /** Start attributing analyzed reads to `principal`. */
  def install(principal: String): Unit = active = Some(principal)

  def clear(): Unit = active = None

  /** Drop all recorded entries (a fresh audit window). */
  def reset(): Unit = { buf.clear(); seq.set(0L) }

  /** The audit log as a DataFrame (seq preserves recording order). */
  def log(session: SparkSession): DataFrame = {
    import scala.jdk.CollectionConverters._
    import session.implicits._
    buf.asScala.toSeq.toDF()
  }

  /** Flush the buffered entries to the versioned lake: drain the queue and
    * write the drained window as ONE new snapshot version of `table` under
    * `root` (the per-table OCC claim path — concurrent flushers serialize
    * like any other snapshot writers). This is what keeps a multi-day
    * 100 TB deployment's driver memory bounded: the in-memory queue only
    * ever holds the entries since the last flush, and the monotone `seq`
    * makes the trail's total order independent of where flush boundaries
    * fall. Entries recorded DURING the drain simply land in the next
    * flush — nothing is lost or reordered (the queue is FIFO and seq is
    * assigned at record time, not flush time). Returns the version
    * written, or None when there was nothing to flush (no empty snapshot
    * versions are minted).
    */
  def flush(session: SparkSession, root: String,
      table: String = "audit_log"): Option[Int] = {
    import session.implicits._
    val drained = scala.collection.mutable.ArrayBuffer.empty[Entry]
    var e = buf.poll()
    while (e != null) { drained += e; e = buf.poll() }
    if (drained.isEmpty) None
    // retentionVersions = MaxValue (the Txn.stage convention): unlike a
    // normal snapshot table where old versions are superseded copies, each
    // audit version holds a UNIQUE flush window — the default keep=7 would
    // silently delete the oldest windows after the 8th flush, truncating a
    // compliance trail. Audit history is never auto-pruned; a deliberate
    // compaction can fold old windows if the version count ever matters.
    else Some(graft.lake.Lake.writeTableSnapshot(
      drained.toSeq.toDF(), root, table, retentionVersions = Int.MaxValue))
  }

  /** The flushed trail: the union of every snapshot version of the audit
    * table (each version is one flush window; `seq` splices them into the
    * global order). O(flush count) snapshot reads — a periodic compaction
    * can fold old versions into one, exactly like any other lake table.
    */
  def flushed(session: SparkSession, root: String,
      table: String = "audit_log"): DataFrame = {
    import session.implicits._
    graft.lake.Lake.versions(session, root, table)
      .map(v => graft.lake.Lake.readTableFeed(session, root, table, Some(v)))
      .reduceOption(_.unionByName(_))
      .getOrElse(session.emptyDataset[Entry].toDF())
  }

  /** The injected check rule (see [[graft.GraftExtensions]]). The walk is
    * the shared [[RelationPaths]] extractor, so the audit sees exactly
    * what [[ReadGuard]] enforces on — v1 relations, v2 relations
    * (including multi-path loads and name-addressed catalog tables), and
    * streaming leaves (a `readStream` over a path is an audited read
    * attempt like any other).
    */
  def checkRule(session: SparkSession): LogicalPlan => Unit = plan =>
    active.foreach { who =>
      plan.foreach { node =>
        RelationPaths.of(node).foreach { p =>
          buf.add(Entry(seq.getAndIncrement(), who, p))
        }
      }
    }
}
