package graft.lake

import java.time.LocalDate

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The partitioned parquet data lake (SURVEY.md §2.A6-A9).
  *
  * Layout mirrors the reference (data_lake_config.py:141-148):
  * {{{
  *   <root>/streams/<name>/year=YYYY/month=M/day=D/<file>.parquet   (append)
  *   <root>/tables/<name>/version=vN/<file>.parquet                 (overwrite)
  * }}}
  * Hive-style directories, so Spark's partition discovery + partition-filter
  * pushdown prune reads for free (a date-range read of a 100 TB stream feed
  * touches only the selected day directories; `.explain` shows
  * PartitionFilters on year/month/day).
  *
  * Unlike the reference (pandas → single file per batch,
  * export_to_data_lake.py:214-233) writes are executor-parallel; file count
  * per partition = upstream parallelism, controllable by the caller via
  * repartition on the partition columns (done here before write so one task
  * owns one output partition — avoids the many-small-files problem at scale).
  */
object Lake {

  def streamPath(root: String, name: String): String = s"$root/streams/$name"
  def tablePath(root: String, name: String): String = s"$root/tables/$name"

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Append a batch into date partitions (A6/A8, kafka_consumer_datalake.py:
    * 33-46). `eventTimeCol` partitions by event time; `None` mirrors the
    * reference's processing-date behavior (`date.today()`,
    * kafka_consumer_datalake.py:36) using `asOfDate`.
    */
  def appendStream(
      df: DataFrame, root: String, name: String,
      eventTimeCol: Option[String] = None,
      asOfDate: LocalDate = LocalDate.now()): Unit = {
    val withParts = eventTimeCol match {
      case Some(c) =>
        df.withColumn("year", year(col(c)))
          .withColumn("month", month(col(c)))
          .withColumn("day", dayofmonth(col(c)))
      case None =>
        df.withColumn("year", lit(asOfDate.getYear))
          .withColumn("month", lit(asOfDate.getMonthValue))
          .withColumn("day", lit(asOfDate.getDayOfMonth))
    }
    withParts
      .repartition(col("year"), col("month"), col("day"))
      .write.mode(SaveMode.Append)
      .partitionBy("year", "month", "day")
      .parquet(streamPath(root, name))
  }

  /** Read a stream feed, optionally pruned to [from, to] — the predicate is
    * on partition columns only, so pruning happens at planning time.
    */
  def readStreamFeed(
      spark: SparkSession, root: String, name: String,
      from: Option[LocalDate] = None, to: Option[LocalDate] = None): DataFrame = {
    val df = spark.read.parquet(streamPath(root, name))
    val dt = make_date(col("year"), col("month"), col("day"))
    val lo = from.map(d => dt >= lit(d.toString).cast("date"))
    val hi = to.map(d => dt <= lit(d.toString).cast("date"))
    (lo ++ hi).foldLeft(df)((acc, p) => acc.filter(p))
  }

  /** Versions present for a table feed, ascending (A7 discovery,
    * export_to_data_lake.py:235-245).
    */
  def versions(spark: SparkSession, root: String, name: String): Seq[Int] = {
    val p = new Path(tablePath(root, name))
    val f = fs(spark, tablePath(root, name))
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("version=v") => s.stripPrefix("version=v").toInt }
      .sorted
  }

  def latestVersion(spark: SparkSession, root: String, name: String): Option[Int] =
    versions(spark, root, name).lastOption

  /** Write the next versioned snapshot (A7, export_to_data_lake.py:160-212):
    * next = max(existing)+1, OVERWRITE into a fresh `version=vN` dir, then
    * prune to `retentionVersions` (C3 inline pruning, :247-265). Readers of
    * vN-1 are unaffected — snapshot isolation by directory convention.
    * Returns the version written.
    */
  def writeTableSnapshot(
      df: DataFrame, root: String, name: String,
      retentionVersions: Int = 7): Int = {
    val spark = df.sparkSession
    val next = latestVersion(spark, root, name).getOrElse(0) + 1
    df.write.mode(SaveMode.Overwrite).parquet(s"${tablePath(root, name)}/version=v$next")
    Retention.pruneTableVersions(spark, root, name, keep = retentionVersions, dryRun = false)
    next
  }

  /** Read a table snapshot: latest version, or a specific one (A3). */
  def readTableFeed(
      spark: SparkSession, root: String, name: String,
      version: Option[Int] = None): DataFrame = {
    val v = version.orElse(latestVersion(spark, root, name))
      .getOrElse(throw new IllegalStateException(s"no versions for table feed $name"))
    spark.read.parquet(s"${tablePath(root, name)}/version=v$v")
  }

  /** StorageMode.IGNORE (data_lake_config.py:13): write only if absent. */
  def writeIgnore(df: DataFrame, path: String): Boolean = {
    val f = fs(df.sparkSession, path)
    if (f.exists(new Path(path))) false
    else { df.write.mode(SaveMode.ErrorIfExists).parquet(path); true }
  }

  /** Compact a stream feed's day partition: rewrite its many small files
    * (the inevitable by-product of frequent micro-batch appends —
    * kafka_consumer_datalake.py flushes every 100 messages) into
    * ~`targetBytes` files. Small-files compaction is the lake-maintenance
    * op that keeps scan task counts sane at 100 TB; the rewrite is
    * per-partition and atomic-enough via write-to-temp + swap. Returns
    * (filesBefore, filesAfter).
    */
  def compactPartition(
      spark: SparkSession, root: String, name: String,
      date: java.time.LocalDate, targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val partDir = s"${streamPath(root, name)}/year=${date.getYear}" +
      s"/month=${date.getMonthValue}/day=${date.getDayOfMonth}"
    val f = fs(spark, partDir)
    val p = new Path(partDir)
    if (!f.exists(p)) return (0, 0)
    def parquetFiles = f.listStatus(p).toSeq.filter(_.getPath.getName.endsWith(".parquet"))
    val before = parquetFiles
    val totalBytes = before.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val tmp = new Path(p.getParent, s".compact_${p.getName}")
    spark.read.parquet(partDir).repartition(nOut)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    // swap via rename-aside: the live data is never deleted before its
    // replacement is in place, so a crash leaves either the old or the new
    // directory discoverable — never neither
    val aside = new Path(p.getParent, s".old_${p.getName}")
    f.delete(aside, true)
    if (!f.rename(p, aside))
      throw new java.io.IOException(s"compaction: could not move $p aside")
    if (!f.rename(tmp, p)) {
      f.rename(aside, p) // roll back
      throw new java.io.IOException(s"compaction: could not promote $tmp")
    }
    f.delete(aside, true)
    // drop the _SUCCESS marker so the dir looks like its siblings
    f.delete(new Path(p, "_SUCCESS"), false)
    (before.size, parquetFiles.size)
  }

  /** Per-feed metadata (A12, export_to_data_lake.py:267-328): one row per
    * partition directory with file count + bytes, from the file system —
    * no data scan.
    */
  def feedMetadata(spark: SparkSession, root: String, name: String): DataFrame = {
    import spark.implicits._
    val base = streamPath(root, name)
    val f = fs(spark, base)
    val rows = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    def walk(p: Path): Unit = f.listStatus(p).foreach { st =>
      if (st.isDirectory) walk(st.getPath)
      else if (st.getPath.getName.endsWith(".parquet")) {
        val rel = st.getPath.getParent.toString.stripPrefix(f.makeQualified(new Path(base)).toString)
        val i = rows.indexWhere(_._1 == rel)
        if (i >= 0) rows(i) = (rel, rows(i)._2 + 1, rows(i)._3 + st.getLen)
        else rows += ((rel, 1L, st.getLen))
      }
    }
    if (f.exists(new Path(base))) walk(new Path(base))
    rows.toSeq.sortBy(_._1).toDF("partition", "files", "bytes")
  }
}
