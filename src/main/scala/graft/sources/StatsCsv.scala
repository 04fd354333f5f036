package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.net.URI
import java.nio.charset.StandardCharsets
import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max => AggMax, Min => AggMin}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions.{col, max, min}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A complete DataSource V2 connector — "stats-indexed CSV": a directory of
  * range-clustered CSV part files plus two tiny sidecars (`_GRAFT_SCHEMA.ddl`,
  * `_GRAFT_STATS.csv` = per-file min/max of the cluster column). The read
  * path exercises the full Catalyst V2 contract:
  *
  *   - `TableProvider.inferSchema` — schema from the sidecar, no user DDL;
  *   - `SupportsPushDownRequiredColumns` — the reader PARSES only the pruned
  *     columns (a projection that reaches the byte level, the CSV analogue
  *     of parquet column pruning);
  *   - `SupportsPushDownFilters` — comparison filters on the stats-indexed
  *     column prune ENTIRE FILES at `planInputPartitions` time (the DSv2
  *     form of [[graft.lake.FileStats.readRange]]'s data skipping). Skipping
  *     only ever drops provably-disjoint files; every filter is also
  *     returned as a residual so Spark re-evaluates row-level — semantics
  *     never depend on the stats being right, only speed does.
  *
  * Scale shape: planning is O(files) on the driver (the same bounded
  * file-list contract as the lake's stats index), each surviving file is one
  * `InputPartition` (split granularity = file, the clustered-write keeps
  * files bounded), and executors stream-parse their file without buffering
  * it. Values round-trip exactly: longs are decimal text, doubles go through
  * `Double.toString`/`parseDouble` (shortest round-trip repr), so a
  * clustered copy of a parquet table is value-identical through this source.
  *
  * Contract: cell text must not contain the delimiter or newlines (the
  * writer's clustered inputs here are machine tokens; a production writer
  * would quote).
  */
object StatsCsvFormat {
  val SchemaFile = "_GRAFT_SCHEMA.ddl"
  val StatsFile = "_GRAFT_STATS.csv"
  val Delim = ","

  /** Cluster `df` by `clusterCol` into `numFiles` range-sorted CSV files and
    * write the schema + per-file min/max sidecars (one extra scan, same
    * one-pass stats shape as `FileStats.buildStats`).
    */
  def write(df: DataFrame, path: String, clusterCol: String, numFiles: Int): Unit = {
    df.repartitionByRange(numFiles, col(clusterCol))
      .sortWithinPartitions(clusterCol)
      .write.mode(SaveMode.Overwrite).option("header", "false").csv(path)
    val s = df.sparkSession
    val stats = s.read.schema(df.schema).option("header", "false").csv(path)
      .groupBy(col("_metadata.file_path").as("file"))
      .agg(min(col(clusterCol)).as("mn"), max(col(clusterCol)).as("mx"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("cnt"))
      .collect()
    val fs = FileSystem.get(new URI(path + "/x").resolve("."), s.sparkContext.hadoopConfiguration)
    val root = new Path(path)
    writeSidecar(fs, new Path(root, SchemaFile), df.schema.toDDL)
    val lines = stats.map { r =>
      val name = r.getString(0).substring(r.getString(0).lastIndexOf('/') + 1)
      s"$name,$clusterCol,${r.get(1)},${r.get(2)},${r.get(3)}"
    }
    writeSidecar(fs, new Path(root, StatsFile), lines.sorted.mkString("\n"))
  }

  private def writeSidecar(fs: FileSystem, p: Path, content: String): Unit = {
    val out = fs.create(p, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  private[sources] def readSidecar(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try {
      val br = new BufferedReader(new InputStreamReader(in, StandardCharsets.UTF_8))
      Iterator.continually(br.readLine()).takeWhile(_ != null).mkString("\n")
    } finally in.close()
  }

  /** One per-file stats row: indexed column, min, max, row count. */
  private[sources] case class StatsEntry(col: String, mn: Long, mx: Long, cnt: Long)

  /** Parse the stats sidecar → file name → entry (malformed lines are
    * dropped, which downstream treats as "keep conservatively / don't
    * answer aggregates from stats").
    */
  private[sources] def readStats(path: String): Map[String, StatsEntry] = {
    val root = new Path(path)
    val fs = root.getFileSystem(SparkSession.active.sparkContext.hadoopConfiguration)
    readSidecar(fs, new Path(root, StatsFile))
      .split("\n").filter(_.nonEmpty).flatMap { line =>
        line.split(",", -1) match {
          case Array(f, c, mn, mx, cnt) =>
            try Some(f -> StatsEntry(c, mn.toLong, mx.toLong, cnt.toLong))
            catch { case _: NumberFormatException => None }
          case _ => None
        }
      }.toMap
  }
}

/** The V2 provider. Registered as `graft-stats-csv` via DataSourceRegister
  * (META-INF/services), so `spark.read.format("graft-stats-csv").load(dir)`
  * resolves it like any built-in source.
  */
class StatsCsvSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-stats-csv"

  /** Writes to a fresh directory have no sidecar to infer from — accept the
    * query's schema instead (reads without a user schema still infer).
    */
  override def supportsExternalMetadata(): Boolean = true

  private def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "graft-stats-csv requires a path")
    p
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = pathOf(options)
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val fs = new Path(path).getFileSystem(conf)
    val ddl = StatsCsvFormat.readSidecar(fs, new Path(path, StatsCsvFormat.SchemaFile))
    StructType.fromDDL(ddl)
  }

  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new StatsCsvTable(properties.get("path"), schema)
}

class StatsCsvTable(path: String, schema: StructType)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"graft-stats-csv:$path"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new StatsCsvScanBuilder(path, schema,
      options.getInt("maxFilesPerTrigger", Int.MaxValue))
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new StatsCsvWriteBuilder(path, info)
}

class StatsCsvScanBuilder(
    path: String, fullSchema: StructType, maxFilesPerTrigger: Int = Int.MaxValue)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty
  private var hadFilters: Boolean = false
  private var aggResult: Option[(StructType, Seq[Long])] = None

  /** Accept comparison filters usable against the file stats; EVERYTHING is
    * returned as residual (Spark re-evaluates row-level), so pushdown is a
    * pure pruning hint, never a semantic dependency — the same posture as
    * parquet's `PushedFilters`.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(StatsCsvScan.prunable)
    hadFilters = filters.nonEmpty
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Ungrouped MIN/MAX/COUNT(*) over the stats column are answered ENTIRELY
    * from the sidecar — zero data files opened (`min = min(file mins)` etc.;
    * the index is exact, built from a full scan at write time). Spark only
    * offers an aggregation when no post-scan filters remain, and this
    * source always keeps filters as residuals, so stats-answered aggregates
    * can never silently combine with a half-applied predicate; the
    * `hadFilters` guard pins that invariant locally too.
    */
  override def pushAggregation(aggregation: Aggregation): Boolean = {
    if (hadFilters || aggregation.groupByExpressions().nonEmpty) return false
    val statsMap = StatsCsvFormat.readStats(path)
    val stats = statsMap.values.toSeq
    if (stats.isEmpty) return false
    // coverage guard: a data file missing from the sidecar (dropped
    // malformed line, all-NULL cluster values, partial external write)
    // would make sidecar-answered aggregates silently wrong — fall back
    val conf0 = SparkSession.active.sparkContext.hadoopConfiguration
    val root0 = new Path(path)
    val dataFiles = root0.getFileSystem(conf0).listStatus(root0).map(_.getPath.getName)
      .filter(n => n.endsWith(".csv") && n != StatsCsvFormat.StatsFile)
    if (!dataFiles.forall(statsMap.contains)) return false
    val statsCol = stats.head.col
    def onStatsCol(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
      e match {
        case r: org.apache.spark.sql.connector.expressions.NamedReference =>
          r.fieldNames.toSeq == Seq(statsCol)
        case _ => false
      }
    val colType = fullSchema(statsCol).dataType
    val answered = aggregation.aggregateExpressions().map {
      case m: AggMin if onStatsCol(m.column) =>
        Some((StructField(s"min_$statsCol", colType), stats.map(_.mn).min))
      case m: AggMax if onStatsCol(m.column) =>
        Some((StructField(s"max_$statsCol", colType), stats.map(_.mx).max))
      case _: CountStar =>
        Some((StructField("count_star", LongType), stats.map(_.cnt).sum))
      case _ => None
    }
    if (answered.exists(_.isEmpty)) return false
    val fields = answered.flatten
    aggResult = Some((StructType(fields.map(_._1)), fields.map(_._2).toSeq))
    true
  }

  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    aggResult.isDefined

  override def build(): Scan = aggResult match {
    case Some((schema, values)) => new StatsCsvAggScan(path, schema, values)
    case None => new StatsCsvScan(path, fullSchema, required, pushed, maxFilesPerTrigger)
  }
}

/** A scan whose entire result is the one pre-aggregated sidecar row — the
  * `planInputPartitions` never lists a data file.
  */
class StatsCsvAggScan(path: String, aggSchema: StructType, values: Seq[Long])
    extends Scan with Batch {
  override def readSchema(): StructType = aggSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-stats-csv $path, aggregated-from-stats=[${aggSchema.fieldNames.mkString(", ")}]"
  override def planInputPartitions(): Array[InputPartition] =
    Array(StatsCsvAggPartition(values))
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private val vs = partition.asInstanceOf[StatsCsvAggPartition].values
          private var emitted = false
          override def next(): Boolean = { val r = !emitted; emitted = true; r }
          override def get(): InternalRow = InternalRow.fromSeq(vs)
          override def close(): Unit = ()
        }
    }
}

case class StatsCsvAggPartition(values: Seq[Long]) extends InputPartition

/** File-index offset: "the first `n` part files (in name order) have been
  * ingested" — the natural exactly-once cursor for an append-only clustered
  * directory (file names are written once, never rewritten; a restart
  * resumes from the committed index).
  */
class FileIndexOffset(val n: Int)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = n.toString
  override def equals(o: Any): Boolean = o match {
    case f: FileIndexOffset => f.n == n
    case _ => false
  }
  override def hashCode(): Int = n
}

/** Micro-batch streaming over the same directory: each batch admits at most
  * `maxFilesPerTrigger` whole files (admission control via `ReadLimit`), and
  * `Trigger.AvailableNow` snapshots the file count up front
  * (`SupportsTriggerAvailableNow`) so the drain is bounded even if files
  * keep arriving. Partition/reader machinery is SHARED with the batch path
  * — one connector, both execution modes, column pruning included.
  */
class StatsCsvMicroBatchStream(
    path: String, fullSchema: StructType, required: StructType,
    maxFilesPerTrigger: Int)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{Offset => StreamOffset, ReadLimit, ReadMaxFiles}

  // the sorted part-file list is re-read per planning call (files are
  // append-only; indexes of already-seen files never change)
  private def files(): Array[String] = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    fs.listStatus(root).map(_.getPath)
      .filter(p => p.getName.endsWith(".csv") && p.getName != StatsCsvFormat.StatsFile)
      .map(_.toString).sorted
  }

  private var availableNowTarget: Option[Int] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(files().length)

  private def available(): Int = availableNowTarget.getOrElse(files().length)

  override def getDefaultReadLimit: ReadLimit =
    if (maxFilesPerTrigger == Int.MaxValue) ReadLimit.allAvailable()
    else ReadLimit.maxFiles(maxFilesPerTrigger)

  override def latestOffset(start: StreamOffset, limit: ReadLimit): StreamOffset = {
    val from = start.asInstanceOf[FileIndexOffset].n
    val cap = limit match {
      case m: ReadMaxFiles => from + m.maxFiles()
      case _ => Int.MaxValue
    }
    new FileIndexOffset(math.min(available(), cap))
  }
  override def reportLatestOffset(): StreamOffset = new FileIndexOffset(available())
  override def latestOffset(): StreamOffset =
    throw new UnsupportedOperationException("use latestOffset(start, limit)")

  override def initialOffset(): StreamOffset = new FileIndexOffset(0)
  override def deserializeOffset(json: String): StreamOffset =
    new FileIndexOffset(json.trim.toInt)

  override def planInputPartitions(start: StreamOffset, end: StreamOffset): Array[InputPartition] = {
    val fs = files()
    fs.slice(start.asInstanceOf[FileIndexOffset].n, end.asInstanceOf[FileIndexOffset].n)
      .map(f => StatsCsvPartition(f): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new StatsCsvReaderFactory(fullSchema, required, columnar = false)

  override def commit(end: StreamOffset): Unit = ()
  override def stop(): Unit = ()
}

case class StatsCsvPartition(filePath: String) extends InputPartition

class StatsCsvScan(
    path: String, fullSchema: StructType, required: StructType,
    pushed: Array[Filter], maxFilesPerTrigger: Int = Int.MaxValue)
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new StatsCsvMicroBatchStream(path, fullSchema, required, maxFilesPerTrigger)
  override def description(): String =
    s"graft-stats-csv $path, pushed=[${pushed.mkString(", ")}]"

  /** Driver-side planning: list part files, read the stats sidecar, drop
    * every file a pushed filter proves disjoint. Files without stats rows
    * (or with non-numeric stats) are kept conservatively.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    val parts = fs.listStatus(root).map(_.getPath)
      .filter(p => p.getName.endsWith(".csv") && p.getName != StatsCsvFormat.StatsFile)
      .sortBy(_.getName)
    val stats = StatsCsvFormat.readStats(path)
    parts.filter { p =>
      stats.get(p.getName) match {
        case Some(e) => !pushed.exists(f => StatsCsvScan.disjoint(f, e.col, e.mn, e.mx))
        case None => true
      }
    }.map(p => StatsCsvPartition(p.toString): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new StatsCsvReaderFactory(fullSchema, required, columnar = true)
}

object StatsCsvScan {
  /** Filters the planner can use for file pruning. */
  def prunable(f: Filter): Boolean = f match {
    case EqualTo(_, v) => numeric(v)
    case GreaterThan(_, v) => numeric(v)
    case GreaterThanOrEqual(_, v) => numeric(v)
    case LessThan(_, v) => numeric(v)
    case LessThanOrEqual(_, v) => numeric(v)
    case _ => false
  }
  private def numeric(v: Any): Boolean = v.isInstanceOf[Number]

  /** True iff `f` on stats column `c` PROVES a file with [mn, mx] has no
    * matching row — the only case skipping is allowed to drop it.
    */
  def disjoint(f: Filter, c: String, mn: Long, mx: Long): Boolean = f match {
    case EqualTo(a, v: Number) if a == c => v.longValue < mn || v.longValue > mx
    case GreaterThan(a, v: Number) if a == c => mx <= v.longValue
    case GreaterThanOrEqual(a, v: Number) if a == c => mx < v.longValue
    case LessThan(a, v: Number) if a == c => mn >= v.longValue
    case LessThanOrEqual(a, v: Number) if a == c => mn > v.longValue
    case _ => false
  }
}

class StatsCsvReaderFactory(
    fullSchema: StructType, required: StructType, columnar: Boolean = false)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[StatsCsvPartition]
    new StatsCsvPartitionReader(p.filePath, fullSchema, required)
  }

  /** Vectorized path: the BATCH scan hands Spark `ColumnarBatch`es filled
    * straight from the parse loop, so downstream operators run on column
    * vectors (Spark inserts one `ColumnarToRow` which whole-stage-codegens
    * the transition) instead of one `InternalRow` allocation per line —
    * the same contract the built-in vectorized parquet reader implements.
    * Streaming keeps the row reader (`columnar = false` there).
    */
  override def supportColumnarReads(partition: InputPartition): Boolean = columnar
  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val p = partition.asInstanceOf[StatsCsvPartition]
    new StatsCsvColumnarReader(p.filePath, fullSchema, required)
  }
}

/** Streams one CSV file into 4096-row `ColumnarBatch`es of on-heap column
  * vectors; only the pruned columns are parsed and vectorized.
  */
class StatsCsvColumnarReader(
    filePath: String, fullSchema: StructType, required: StructType,
    capacity: Int = 4096)
    extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {

  import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
  import org.apache.spark.sql.vectorized.ColumnarBatch

  private val fields: Array[(Int, DataType)] = required.fields.map { f =>
    (fullSchema.fieldIndex(f.name), f.dataType)
  }
  private val vectors: Array[OnHeapColumnVector] =
    OnHeapColumnVector.allocateColumns(capacity, required)
  private val batch = new ColumnarBatch(vectors.map(v =>
    v: org.apache.spark.sql.vectorized.ColumnVector), 0)

  private lazy val reader: BufferedReader = {
    val p = new Path(filePath)
    val fs = p.getFileSystem(new Configuration())
    new BufferedReader(new InputStreamReader(fs.open(p), StandardCharsets.UTF_8))
  }

  override def next(): Boolean = {
    vectors.foreach(_.reset())
    var n = 0
    var line = reader.readLine()
    while (line != null && n < capacity) {
      val cells = line.split(StatsCsvFormat.Delim, -1)
      var i = 0
      while (i < fields.length) {
        val (src, dt) = fields(i)
        val cell = cells(src)
        val v = vectors(i)
        if (cell.isEmpty) v.putNull(n)
        else dt match {
          case LongType => v.putLong(n, java.lang.Long.parseLong(cell))
          case IntegerType => v.putInt(n, java.lang.Integer.parseInt(cell))
          case DoubleType => v.putDouble(n, java.lang.Double.parseDouble(cell))
          case StringType =>
            val b = cell.getBytes(StandardCharsets.UTF_8)
            v.putByteArray(n, b, 0, b.length)
          case BooleanType => v.putBoolean(n, java.lang.Boolean.parseBoolean(cell))
          case d: DecimalType => v.putDecimal(n,
            org.apache.spark.sql.types.Decimal(
              new java.math.BigDecimal(cell), d.precision, d.scale), d.precision)
          case other => throw new IllegalArgumentException(
            s"graft-stats-csv: unsupported type $other")
        }
        i += 1
      }
      n += 1
      if (n < capacity) line = reader.readLine()
    }
    batch.setNumRows(n)
    n > 0
  }

  override def get(): ColumnarBatch = batch
  override def close(): Unit = { reader.close(); batch.close() }
}

/** Streams one CSV file, converting ONLY the pruned columns to Catalyst
  * values — unneeded cells are never even type-converted.
  */
class StatsCsvPartitionReader(
    filePath: String, fullSchema: StructType, required: StructType)
    extends PartitionReader[InternalRow] {

  // (source index in the full row, target type) per output column
  private val fields: Array[(Int, DataType)] = required.fields.map { f =>
    (fullSchema.fieldIndex(f.name), f.dataType)
  }

  private lazy val reader: BufferedReader = {
    val p = new Path(filePath)
    val fs = p.getFileSystem(new Configuration())
    new BufferedReader(new InputStreamReader(fs.open(p), StandardCharsets.UTF_8))
  }
  private var line: String = _

  override def next(): Boolean = {
    line = reader.readLine()
    line != null
  }

  override def get(): InternalRow = {
    val cells = line.split(StatsCsvFormat.Delim, -1)
    InternalRow.fromSeq(fields.toIndexedSeq.map { case (i, dt) =>
      val cell = cells(i)
      if (cell.isEmpty) null
      else dt match {
        case LongType => java.lang.Long.parseLong(cell)
        case IntegerType => java.lang.Integer.parseInt(cell)
        case DoubleType => java.lang.Double.parseDouble(cell)
        case StringType => UTF8String.fromString(cell)
        case BooleanType => java.lang.Boolean.parseBoolean(cell)
        case d: DecimalType => org.apache.spark.sql.types.Decimal(
          new java.math.BigDecimal(cell), d.precision, d.scale)
        case other => throw new IllegalArgumentException(
          s"graft-stats-csv: unsupported type $other")
      }
    })
  }

  override def close(): Unit = if (reader != null) reader.close()
}

// ───────────────────────────── write path ─────────────────────────────

/** The V2 WRITE half of the connector. Three contracts exercised:
  *
  *   - `WriteBuilder` + `SupportsTruncate`: `mode("overwrite")` plans
  *     `truncate()` (replace-directory semantics at COMMIT time — never a
  *     delete-then-fail window);
  *   - `RequiresDistributionAndOrdering`: the write DECLARES its layout —
  *     range-cluster by the `cluster` option, sort within partitions,
  *     `numFiles` partitions — and Spark plans the exchange/sort; callers
  *     just `df.write.format("graft-stats-csv")`, the connector owns the
  *     physical layout contract (this is what makes every written directory
  *     automatically skippable by the read path);
  *   - `BatchWrite`/`DataWriter` two-phase commit: tasks stream rows to
  *     STAGED files and fold the per-file min/max/count as they go; task
  *     `commit()` returns those stats as the commit message; the driver's
  *     `commit(messages)` renames staged files into place and writes the
  *     schema + stats sidecars LAST (a crash before that leaves the old
  *     directory fully readable); `abort()` deletes the staging dir.
  *
  * Scale shape: stats come from the write stream itself (zero extra scans —
  * vs the companion [[StatsCsvFormat.write]] helper's post-pass), commit is
  * O(files) driver-side renames, and speculative/retried task attempts
  * stage to attempt-unique names with the driver arbitrating one winner.
  */
class StatsCsvWriteBuilder(
    path: String, info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {

  private var truncateFirst = false

  override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = {
    truncateFirst = true; this
  }

  override def build(): org.apache.spark.sql.connector.write.Write = {
    val cluster = info.options.get("cluster")
    require(cluster != null && cluster.nonEmpty,
      "graft-stats-csv write requires .option(\"cluster\", <integral column>)")
    val schema = info.schema()
    require(Seq(LongType, IntegerType).contains(schema(cluster).dataType),
      s"cluster column $cluster must be integral (stats index is long-typed)")
    new StatsCsvWrite(path, schema, cluster,
      info.options.getInt("numFiles", 8), truncateFirst, info.queryId())
  }
}

class StatsCsvWrite(
    path: String, schema: StructType, cluster: String, numFiles: Int,
    truncateFirst: Boolean, queryId: String)
    extends org.apache.spark.sql.connector.write.Write
    with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {

  import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
  import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder}

  private def sortOrder: SortOrder =
    Expressions.sort(Expressions.column(cluster), SortDirection.ASCENDING)

  /** Range-cluster on the stats column: ordered distribution = Spark plans a
    * range exchange, so distinct output files cover disjoint key ranges and
    * the stats index prunes maximally.
    */
  override def requiredDistribution(): Distribution =
    Distributions.ordered(Array(sortOrder))
  override def requiredOrdering(): Array[SortOrder] = Array(sortOrder)
  override def requiredNumPartitions(): Int = numFiles

  override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
    new StatsCsvBatchWrite(path, schema, cluster, truncateFirst, queryId)

  override def toStreaming
      : org.apache.spark.sql.connector.write.streaming.StreamingWrite =
    new StatsCsvStreamingWrite(path, schema, cluster, queryId)
}

/** The STREAMING half of the write path (micro-batch epochs). Files are
  * named `part-<epoch>-<partition>.csv` — deterministic per (epoch, task
  * partition) — and each epoch commit REPLACES its own files and stats
  * lines, so a replayed epoch (failure between sink commit and checkpoint
  * write) converges to the same directory state: effective exactly-once on
  * top of at-least-once delivery, the same idempotent-sink contract as the
  * parquet foreachBatch sinks in `graft.streaming`. The stats sidecar is
  * maintained incrementally per epoch (merge by file name), so the batch
  * read path's file skipping and aggregate pushdown keep working on a
  * directory a stream is still appending to.
  */
class StatsCsvStreamingWrite(
    path: String, schema: StructType, cluster: String, queryId: String)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  import org.apache.spark.sql.connector.write.{PhysicalWriteInfo, WriterCommitMessage}
  import org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory

  private def stagingDir = new Path(path, s".staging-$queryId")

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new StatsCsvStreamingWriterFactory(path, stagingDir.toString, schema,
      schema.fieldIndex(cluster))

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    val winners = messages.collect {
      case m: StatsCsvCommitMessage if m.file != null => m
    }
    winners.foreach { m =>
      val to = new Path(root, m.finalName)
      if (fs.exists(to)) fs.delete(to, false) // epoch replay: replace, never duplicate
      require(fs.rename(new Path(m.file), to), s"rename failed: ${m.file} -> $to")
    }
    val schemaFile = new Path(root, StatsCsvFormat.SchemaFile)
    if (!fs.exists(schemaFile)) {
      val o = fs.create(schemaFile, true)
      try o.write(schema.toDDL.getBytes(StandardCharsets.UTF_8)) finally o.close()
    }
    // merge stats: drop prior lines for this epoch's files, add the fresh ones
    val statsFile = new Path(root, StatsCsvFormat.StatsFile)
    val replaced = winners.map(_.finalName).toSet
    val prior =
      if (fs.exists(statsFile))
        StatsCsvFormat.readSidecar(fs, statsFile).split("\n")
          .filter(_.nonEmpty).filterNot(l => replaced.contains(l.takeWhile(_ != ',')))
      else Array.empty[String]
    val fresh = winners.filter(m => m.cnt > 0 && m.mn <= m.mx).map(m =>
      s"${m.finalName},$cluster,${m.mn},${m.mx},${m.cnt}")
    val o2 = fs.create(statsFile, true)
    try o2.write((prior ++ fresh).sorted.mkString("\n").getBytes(StandardCharsets.UTF_8))
    finally o2.close()
    // losing/retried attempts leave .staged files; epochs are sequential,
    // so the staging dir is garbage once this epoch's winners are promoted
    fs.delete(stagingDir, true)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    new Path(path).getFileSystem(conf).delete(stagingDir, true)
  }
}

class StatsCsvStreamingWriterFactory(
    path: String, stagingDir: String, schema: StructType, clusterIdx: Int)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new StatsCsvDataWriter(stagingDir, schema, clusterIdx, partitionId, taskId,
      finalName = f"part-$epochId%05d-$partitionId%05d.csv")
}

/** Per-task result: where the staged file is, its final name, and the
  * cluster-column stats folded while writing. `file == null` marks an empty
  * partition (nothing staged).
  */
case class StatsCsvCommitMessage(
    file: String, finalName: String, mn: Long, mx: Long, cnt: Long)
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

class StatsCsvBatchWrite(
    path: String, schema: StructType, cluster: String,
    truncateFirst: Boolean, queryId: String)
    extends org.apache.spark.sql.connector.write.BatchWrite {

  private def stagingDir = new Path(path, s".staging-$queryId")

  // file names carry a query-unique prefix so APPEND generations can never
  // collide with (and silently replace) an earlier write's part files
  private def gen = queryId.replaceAll("[^a-zA-Z0-9]", "").take(8)

  override def createBatchWriterFactory(
      info: org.apache.spark.sql.connector.write.PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.DataWriterFactory =
    new StatsCsvWriterFactory(path, stagingDir.toString, schema,
      schema.fieldIndex(cluster), gen)

  /** Driver-side finalize: arbitrate one staged file per partition, rename
    * into place, then write the sidecars (schema first, stats LAST — the
    * read path keys off the stats file, so a reader never sees half a
    * commit). Truncate deletes the previous generation only after every
    * rename succeeded.
    */
  override def commit(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    val winners = messages.collect {
      case m: StatsCsvCommitMessage if m.file != null => m
    }
    val previous =
      if (fs.exists(root))
        fs.listStatus(root).map(_.getPath)
          .filter(p => p.getName.endsWith(".csv") && p.getName != StatsCsvFormat.StatsFile)
      else Array.empty[Path]
    winners.foreach { m =>
      val to = new Path(root, m.finalName)
      if (fs.exists(to)) fs.delete(to, false)
      require(fs.rename(new Path(m.file), to), s"rename failed: ${m.file} -> $to")
    }
    if (truncateFirst) {
      // replace semantics, promoted-first ordering: the new generation is
      // fully in place before any old file not overwritten by a rename is
      // swept, so a crash mid-commit leaves a superset, never a hole
      val kept = winners.map(_.finalName).toSet
      previous.filterNot(p => kept.contains(p.getName))
        .foreach(p => fs.delete(p, false))
    }
    // merge (append) or replace (truncate) the stats sidecar; a file whose
    // cluster values were all NULL emits NO line — the aggregate-pushdown
    // coverage check then forces a real scan instead of serving sentinels
    val statsLines = winners.filter(m => m.cnt > 0 && m.mn <= m.mx).map { m =>
      s"${m.finalName},$cluster,${m.mn},${m.mx},${m.cnt}"
    }
    val statsFile = new Path(root, StatsCsvFormat.StatsFile)
    val replaced = winners.map(_.finalName).toSet
    val prior =
      if (!truncateFirst && fs.exists(statsFile))
        StatsCsvFormat.readSidecar(fs, statsFile).split("\n")
          .filter(_.nonEmpty).filterNot(l => replaced.contains(l.takeWhile(_ != ',')))
      else Array.empty[String]
    val out1 = fs.create(new Path(root, StatsCsvFormat.SchemaFile), true)
    try out1.write(schema.toDDL.getBytes(StandardCharsets.UTF_8)) finally out1.close()
    val out2 = fs.create(statsFile, true)
    try out2.write((prior ++ statsLines).sorted.mkString("\n")
      .getBytes(StandardCharsets.UTF_8))
    finally out2.close()
    fs.delete(stagingDir, true)
  }

  override def abort(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val fs = new Path(path).getFileSystem(conf)
    fs.delete(stagingDir, true)
  }
}

class StatsCsvWriterFactory(
    path: String, stagingDir: String, schema: StructType, clusterIdx: Int,
    gen: String)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new StatsCsvDataWriter(stagingDir, schema, clusterIdx, partitionId, taskId,
      finalName = f"part-$gen%s-$partitionId%05d.csv")
}

/** Streams rows to one staged CSV file, folding min/max/count of the
  * cluster column in-line (the stats index costs nothing extra). The staged
  * name carries the task id so retried attempts never collide; the FINAL
  * name is partition-indexed, so the committed directory lists in cluster
  * order.
  */
class StatsCsvDataWriter(
    stagingDir: String, schema: StructType, clusterIdx: Int,
    partitionId: Int, taskId: Long,
    finalName: String = null)
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {

  private val targetName =
    if (finalName != null) finalName else f"part-$partitionId%05d.csv"


  private var out: java.io.BufferedWriter = _
  private var staged: Path = _
  private var mn = Long.MaxValue
  private var mx = Long.MinValue
  private var cnt = 0L

  private val types = schema.fields.map(_.dataType)

  private def ensureOpen(): Unit = if (out == null) {
    staged = new Path(stagingDir, s"$targetName-attempt-$taskId.staged")
    val fs = staged.getFileSystem(new Configuration())
    out = new java.io.BufferedWriter(
      new java.io.OutputStreamWriter(fs.create(staged, true), StandardCharsets.UTF_8))
  }

  override def write(row: InternalRow): Unit = {
    ensureOpen()
    val sb = new StringBuilder
    var i = 0
    while (i < types.length) {
      if (i > 0) sb.append(StatsCsvFormat.Delim)
      if (!row.isNullAt(i)) types(i) match {
        case LongType => sb.append(row.getLong(i))
        case IntegerType => sb.append(row.getInt(i))
        case DoubleType => sb.append(row.getDouble(i))
        case StringType =>
          val s = row.getUTF8String(i).toString
          // the read path is a plain split on Delim/newline (no quoting
          // dialect), so a cell containing either would silently shift
          // every later column — fail the write, don't corrupt the file
          if (s.indexOf(StatsCsvFormat.Delim) >= 0 || s.indexOf('\n') >= 0 ||
              s.indexOf('\r') >= 0)
            throw new IllegalArgumentException(
              s"graft-stats-csv: string cell in column ${schema.fields(i).name} " +
                "contains the delimiter or a newline, which this unquoted CSV " +
                "dialect cannot represent")
          sb.append(s)
        case BooleanType => sb.append(row.getBoolean(i))
        // toPlainString: the read path re-parses cells with BigDecimal, and
        // scientific notation from toString would round-trip but surprise
        // any external reader of the sidecar'd CSV
        case d: DecimalType => sb.append(
          row.getDecimal(i, d.precision, d.scale).toJavaBigDecimal.toPlainString)
        case other => throw new IllegalArgumentException(
          s"graft-stats-csv: unsupported type $other")
      }
      i += 1
    }
    sb.append('\n')
    out.write(sb.toString)
    if (!row.isNullAt(clusterIdx)) {
      val k = types(clusterIdx) match {
        case LongType => row.getLong(clusterIdx)
        case _ => row.getInt(clusterIdx).toLong
      }
      if (k < mn) mn = k
      if (k > mx) mx = k
    }
    cnt += 1
  }

  override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage = {
    if (out != null) out.close()
    StatsCsvCommitMessage(
      if (staged == null) null else staged.toString,
      targetName, mn, mx, cnt)
  }

  override def abort(): Unit = {
    if (out != null) out.close()
    if (staged != null) staged.getFileSystem(new Configuration()).delete(staged, false)
  }

  override def close(): Unit = if (out != null) { out.close(); out = null }
}
