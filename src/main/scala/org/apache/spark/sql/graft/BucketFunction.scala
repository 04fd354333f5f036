package org.apache.spark.sql.graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, Murmur3HashFunction}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, Reducer, ReducibleFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReaderFactory, Scan, SupportsReportPartitioning}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}

/** The catalog's `bucket(numBuckets, col)` V2 function — the function
  * identity behind STORAGE-PARTITIONED JOINS over `bucket_by` tables.
  *
  * Spark resolves a scan-reported `KeyGroupedPartitioning(bucket(N, k))`
  * through the relation's [[org.apache.spark.sql.connector.catalog
  * .FunctionCatalog]]: it loads `bucket`, binds it to `(numBuckets: int,
  * key)`, and wraps the bound function in a `TransformExpression` whose
  * `canonicalName` decides whether two sides of a join are co-partitioned.
  * Both sides of a graft⋈graft join bind THIS function, so equal
  * `(canonicalName, N)` + equal partition values ⇒ `EnsureRequirements`
  * plans the join with ZERO exchanges (the storage-partitioned-join shape:
  * at 100 TB the two snapshot-wide shuffles a keyed join pays are the
  * dominant cost this deletes).
  *
  * The semantics MUST stay `pmod(murmur3_seed42(key), N)` — exactly
  * [[graft.lake.BucketLayout.bucketId]], i.e. exactly what the
  * `repartition(N, col)` write policy used to place rows — so a value
  * Spark computes through this function (the `v2.bucketing.shuffle` path,
  * where only one side is bucketed) lands in the same partition the
  * layout put its matches in.
  */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, col): pmod(murmur3_seed42(col), numBuckets) — the bucket_by layout hash"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket takes (numBuckets int, key); got ${inputType.simpleString}")
    require(inputType.fields(0).dataType == IntegerType,
      s"bucket's first argument must be int; got ${inputType.fields(0).dataType.simpleString}")
    BoundBucket(inputType.fields(1).dataType)
  }
}

/** Bound form of [[GraftBucketFunction]] for one key type. `canonicalName`
  * is type-independent on purpose: two sides bucketed on differently-typed
  * keys still only co-partition when the JOIN key types line up, which
  * Spark's own `TransformExpression.isSameFunction` + key-type checks
  * enforce; the name identifies the HASH, murmur3-seed-42 + pmod.
  *
  * Also a [[ReducibleFunction]]: `bucket(16, k)` REDUCES to `bucket(8, k)`
  * because `pmod(h, 16) % 8 == pmod(h, 8)` whenever the coarser count
  * divides the finer — so a `k:16` table joins a `k:8` table exchange-free
  * (under `spark.sql.sources.v2.bucketing.allowCompatibleTransforms
  * .enabled`): the planner maps every fine bucket id down with the
  * [[BucketReducer]] and co-locates the halved groups, instead of
  * shuffling both snapshots because the counts differ.
  */
final case class BoundBucket(keyType: DataType)
    extends ScalarFunction[Integer] with ReducibleFunction[Integer, Integer] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, keyType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String = "graft.bucket(murmur3_42,pmod)"
  override def isResultNullable: Boolean = false
  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    // null hashes to the seed unchanged — the same row `repartition` put it in
    val h =
      if (input.isNullAt(1)) 42
      else Murmur3HashFunction.hash(input.get(1, keyType), keyType, 42L).toInt
    ((h % n) + n) % n
  }
  override def reducer(
      thisNumBuckets: Int,
      otherFunction: ReducibleFunction[_, _],
      otherNumBuckets: Int): Reducer[Integer, Integer] = otherFunction match {
    case b: BoundBucket if b.canonicalName() == canonicalName() &&
        thisNumBuckets != otherNumBuckets &&
        thisNumBuckets % otherNumBuckets == 0 =>
      BucketReducer(otherNumBuckets)
    case _ => null // not reducible: same count, non-divisor, foreign hash
  }
}

/** Maps a finer bucket id to its coarser bucket: sound for the pmod hash
  * exactly when `coarse` divides the finer count (see [[BoundBucket]]).
  */
final case class BucketReducer(coarse: Int) extends Reducer[Integer, Integer] {
  override def reduce(v: Integer): Integer = v % coarse
}

/** A [[FilePartition]] that knows which bucket it is — the
  * [[HasPartitionKey]] leg of the storage-partitioned-join contract.
  * Subclassing keeps it acceptable to Spark's own
  * `FilePartitionReaderFactory` (which pattern-matches `FilePartition`),
  * so the inner parquet scan's reader factory is reused verbatim.
  */
final class BucketFilePartition(
    index: Int, files: Array[PartitionedFile], bucket: Int)
  extends FilePartition(index, files) with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](bucket))
}

/** Wraps a parquet [[Scan]] over a fully-bucket-mapped snapshot to REPORT
  * the layout to Spark's planner: `outputPartitioning` declares
  * `KeyGroupedPartitioning(bucket(N, col), N)` and `planInputPartitions`
  * regroups the inner scan's file splits into exactly one
  * [[BucketFilePartition]] per bucket id (0..N-1, empty buckets included
  * so both sides of a join always expose identical partition values).
  * Everything else — reader factory, schema, pushed filters — is the
  * inner scan's; only the grouping changes.
  *
  * The trade is Spark's own SPJ trade (active only under
  * `spark.sql.sources.v2.bucketing.enabled`): a scan becomes N tasks, one
  * per bucket, in exchange for keyed joins/aggregates over co-bucketed
  * tables running WITHOUT a shuffle on either side.
  *
  * `byName` maps file NAME → bucket (names are unique per snapshot —
  * verified by the caller before wrapping); a scanned file absent from
  * the mapping aborts the query rather than mis-grouping rows, because a
  * wrong group silently breaks join co-partitioning.
  */
final class BucketReportingScan(
    inner: Scan, col: String, n: Int, byName: Map[String, Int])
  extends Scan with Batch with SupportsReportPartitioning {

  override def readSchema(): StructType = inner.readSchema()
  override def description(): String =
    s"${inner.description()} [bucket-reporting $col:$n]"
  override def toBatch: Batch = this

  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(Array(Expressions.bucket(n, col)), n)

  private lazy val innerBatch: Batch = inner.toBatch

  override def planInputPartitions(): Array[InputPartition] = {
    val files: Array[PartitionedFile] = innerBatch.planInputPartitions().flatMap {
      case fp: FilePartition => fp.files
      case other => throw new IllegalStateException(
        s"bucket-reporting scan expected file partitions, got ${other.getClass}")
    }
    val grouped = files.groupBy { pf =>
      val name = pf.toPath.getName
      val b = byName.getOrElse(name, throw new IllegalStateException(
        s"file $name is not in the verified bucket mapping — layout/scan divergence"))
      // rowless writer files are mapped to -1: they hold nothing, any group is sound
      math.max(b, 0)
    }
    Array.tabulate(n) { b =>
      new BucketFilePartition(b, grouped.getOrElse(b, Array.empty), b)
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    innerBatch.createReaderFactory()
}

object BucketReportingScan {
  /** Wrap `scan` when the snapshot's verified layout makes reporting
    * SOUND: a consistent `(col, N)` over every snapshot file, the bucket
    * column still in the scan's output (the planner resolves the
    * transform's reference against it), no name ambiguity across dirs
    * (manifest-carried files live in their original version dirs), and
    * the session actually has V2 bucketing on — off means Spark ignores
    * the report but would still pay the N-task grouping, so the default
    * path stays byte-identical.
    */
  def maybeWrap(
      spark: org.apache.spark.sql.SparkSession, scan: Scan,
      layout: Option[(String, Int, Map[String, Int])]): Scan = {
    if (!spark.sessionState.conf.v2BucketingEnabled) return scan
    layout match {
      case Some((c, n, mapping)) if scan.readSchema().fieldNames.contains(c) =>
        val byName = mapping.toSeq.map { case (p, b) => new Path(p).getName -> b }
        val ambiguous =
          byName.groupBy(_._1).exists(_._2.map(_._2).distinct.size > 1)
        if (ambiguous) scan else new BucketReportingScan(scan, c, n, byName.toMap)
      case _ => scan
    }
  }
}
