package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared maintenance mechanics for the incremental-index family
  * ([[IncrementalFuzzy]], [[IncrementalLsh]], [[IncrementalSimhash]],
  * [[IncrementalIvf]]): append-only maintenance accumulates one small
  * file batch per append, and every index state table is a DETERMINISTIC
  * function of the corpus — so `distinct + coalesced rewrite` is an
  * equivalence-preserving compaction for all of them, and a
  * swap-rewrite (write aside, delete, rename) is the shared primitive
  * both compaction and targeted rewrites (erasure) build on.
  *
  * Single-writer ops: compaction/erasure run at maintenance cadence under
  * the same exclusive-writer assumption as the appends themselves; a
  * deployment needing concurrent maintenance publishes through the
  * versioned-lake path (`a23_fuzzy_index_sql`) whose OCC commits
  * serialize writers.
  */
object IndexMaintenance {

  /** Replace table directory `root/table` with `df`, materialized first
    * (localCheckpoint) so the rewrite never reads its own output.
    */
  def swapIn(s: SparkSession, root: String, table: String, df: DataFrame): Unit = {
    val conf = s.sparkContext.hadoopConfiguration
    val dir = new org.apache.hadoop.fs.Path(s"$root/$table")
    val fs = dir.getFileSystem(conf)
    val next = df.localCheckpoint()
    val tmp = new org.apache.hadoop.fs.Path(s"$root/.swap_$table")
    next.write.mode("overwrite").parquet(tmp.toString)
    fs.delete(dir, true)
    require(fs.rename(tmp, dir), s"swapIn: rename failed for $table")
  }

  /** Run several INDEPENDENT single-table [[swapIn]] rewrites
    * concurrently — each must read and replace only its own table (any
    * shared input checkpointed by the caller first), so the batch pays
    * the max of the job latencies instead of the sum. Concurrency is
    * across TABLES inside one maintenance op; the index's single-writer
    * contract (ops serialize with each other) is untouched.
    */
  def swapInConcurrently(
      s: SparkSession, root: String, rewrites: Seq[(String, DataFrame)]): Unit = {
    require(rewrites.map(_._1).distinct.size == rewrites.size,
      "swapInConcurrently: one rewrite per table")
    if (rewrites.size <= 1) {
      rewrites.foreach { case (t, df) => swapIn(s, root, t, df) }
      return
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(rewrites.size)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      // Await EVERY rewrite (Try-wrapped, so one failure doesn't
      // short-circuit the wait) before propagating the first failure —
      // Future.sequence rethrows on the first failed future while sibling
      // swap-ins may still be mid-delete/rename, and a caller reacting to
      // the exception (read, retry) would race those in-flight swaps.
      val outcomes = scala.concurrent.Await.result(
        scala.concurrent.Future.traverse(rewrites) { case (t, df) =>
          scala.concurrent.Future(swapIn(s, root, t, df))
            .transform(r => scala.util.Success(t -> r))
        },
        scala.concurrent.duration.Duration.Inf)
      outcomes.collectFirst { case (t, scala.util.Failure(e)) =>
        throw new RuntimeException(s"swapInConcurrently: rewrite of '$t' failed " +
          "(all sibling rewrites have completed or failed — none in flight)", e)
      }
      ()
    } finally { pool.shutdown() }
  }

  /** Compact `tables` under `root`: deduplicate and rewrite each as
    * `filesPerTable` files. Correct exactly when every table has set
    * semantics with deterministic rows — the incremental-index contract.
    */
  def compactTables(
      s: SparkSession, root: String, tables: Seq[String],
      filesPerTable: Int = 1): Unit =
    tables.foreach { t =>
      swapIn(s, root, t,
        s.read.parquet(s"$root/$t").distinct().coalesce(filesPerTable))
    }
}
