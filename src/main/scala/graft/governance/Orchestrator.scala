package graft.governance

import java.time.LocalDate

import org.apache.spark.sql.SparkSession
import graft.Tables
import graft.lake.Lake
import graft.queries.Reference
import graft.warehouse.Warehouse

/** Pipeline orchestration (SURVEY.md §2.C6, beam_orchestrator.py).
  *
  * The reference wraps `subprocess.run` of its scripts in a one-element Beam
  * pipeline fired by `schedule.every(N).minutes` — the Beam layer adds no
  * dataflow semantics. Here each tick is a plain function running the full
  * export+sync cycle natively (generate → lake append → aggregate →
  * versioned snapshot → warehouse merge); continuous operation is the
  * caller's `Trigger.ProcessingTime` streaming query or an external
  * scheduler around `runOnce` (spark-submit + cron), matching SURVEY.md
  * §2.C6's mapping.
  */
object Orchestrator {

  case class TaskResult(task: String, status: String, detail: String)

  /** One orchestration tick over the testdata (the reference's `--all`
    * export, §3.2, fused with the warehouse sync, §3.3). Per-feed failures
    * are caught and reported, matching export_to_data_lake.py:156-158.
    */
  def runOnce(spark: SparkSession, sfDir: String, lakeRoot: String,
      asOf: LocalDate = LocalDate.of(2024, 6, 1)): Seq[TaskResult] = {
    def attempt(name: String)(body: => String): TaskResult =
      try TaskResult(name, "ok", body)
      catch { case e: Exception => TaskResult(name, "error", String.valueOf(e.getMessage)) }

    val exportStreams = attempt("export_streams") {
      val ev = Tables.events(spark, sfDir)
        .select("event_id", "user_id", "event_type", "value", "ts_us")
        .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.col("ts_us")))
      Lake.appendStream(ev, lakeRoot, "events", eventTimeCol = Some("ts"))
      s"partitions=${Lake.feedMetadata(spark, lakeRoot, "events").count()}"
    }
    val exportTables = attempt("export_tables") {
      val v = Lake.writeTableSnapshot(
        Reference.b6PaymentTotals(spark, sfDir), lakeRoot, "payment_method_totals")
      s"version=v$v"
    }
    val syncWarehouse = attempt("sync_warehouse") {
      val dim = Warehouse.dimUsers(Tables.customer(spark, sfDir),
        java.sql.Date.valueOf(asOf))
      val v = Warehouse.mergeIntoTable(spark, lakeRoot, "dim_users",
        dim, Seq("user_id"), Seq("updated_at"))
      s"version=v$v"
    }
    Seq(exportStreams, exportTables, syncWarehouse)
  }

  case class TickResult(tick: Int, results: Seq[TaskResult])

  /** Continuous scheduled operation (beam_orchestrator.py:117-131: the
    * reference's `schedule.every(N).minutes` loop, here a bounded timed
    * loop). Each tick runs the full export+sync cycle; versioned sinks
    * advance one version per tick, which is the property the
    * `c6_orchestrator_schedule` gate pins (v1→v2→v3). `ticks <= 0` runs
    * forever — the production mode; bounded runs are for tests/gates.
    * Wall-clock pacing uses fixed-delay semantics like the reference
    * (interval measured from tick end).
    */
  def runScheduled(
      spark: SparkSession, sfDir: String, lakeRoot: String,
      ticks: Int, intervalMs: Long,
      asOf: LocalDate = LocalDate.of(2024, 6, 1)): Seq[TickResult] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[TickResult]
    var i = 0
    while (ticks <= 0 || i < ticks) {
      if (i > 0) Thread.sleep(intervalMs)
      i += 1
      val r = TickResult(i, runOnce(spark, sfDir, lakeRoot, asOf))
      // in forever mode the return value is unreachable — don't accumulate
      if (ticks > 0) out += r
    }
    out.toSeq
  }
}
