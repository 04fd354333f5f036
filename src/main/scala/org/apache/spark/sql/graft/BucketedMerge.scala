package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow, RowOrdering, UnsafeProjection}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** EXCHANGE-FREE keyed diff of two hash-bucketed snapshots
  * ([[graft.lake.BucketLayout]]) — what [[graft.lake.Lake.versionDiff]]'s
  * scaladoc promised bucketing would buy.
  *
  * Both snapshots were written `repartition(N, key)`, so bucket `i` of the
  * old snapshot and bucket `i` of the new one hold exactly the same key
  * space. The diff therefore never needs Spark's shuffle: partition `i`
  * of the plan reads the two buckets' files directly (one
  * `PartitionedFile` reader per file, the same bridge the change-feed
  * stream uses), SORTS each side within the partition (a sort is not an
  * exchange — it spills, it never moves rows between partitions), and
  * streams a two-iterator sorted MERGE that classifies each key as
  * inserted / deleted / updated / unchanged with one-row lookahead and
  * O(1) memory. The resulting RDD lineage contains NO ShuffleDependency —
  * pinned by spec and PLANS — so at 100 TB the two snapshot-wide
  * exchanges a keyed full-outer join would pay simply do not exist; cost
  * is one streaming pass over each snapshot, per-bucket parallel.
  *
  * Semantics mirror the join-based diff: value payloads compare as the
  * key-ordered sides' remaining columns (UnsafeRow byte equality after a
  * shared projection); a NULL in the key never matches anything (the SQL
  * join contract — such rows emit as deleted + inserted); snapshots are
  * assumed key-unique, the keyed-CDF contract every diff path shares.
  */
object BucketedMerge {

  /** Any ShuffleDependency anywhere in the lineage? The honest form of
    * the "no Exchange" pin: the SQL plan of an RDD-backed frame hides the
    * upstream DAG, so specs assert on the dependency graph itself.
    */
  def hasShuffle(rdd: RDD[_]): Boolean =
    rdd.dependencies.exists {
      case _: org.apache.spark.ShuffleDependency[_, _, _] => true
      case d => hasShuffle(d.rdd)
    }

  private def classicOf(spark: SparkSession) =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]

  /** One DataFrame partition per bucket, each reading exactly its
    * bucket's files through Spark's parquet reader — no exchange, no file
    * index, the bucket mapping IS the plan.
    */
  private def bucketSide(
      spark: SparkSession, byBucket: IndexedSeq[Seq[(String, Long)]],
      schema: StructType): DataFrame = {
    val readFunc = GraftChangeFeed.readFuncFor(spark, schema)
    val rdd: RDD[InternalRow] = spark.sparkContext
      .parallelize(byBucket, math.max(byBucket.size, 1))
      .mapPartitions(_.flatMap(_.iterator.flatMap { case (p, len) =>
        readFunc(PartitionedFile(
          InternalRow.empty,
          org.apache.spark.paths.SparkPath.fromPathString(p),
          0L, len, Array.empty[String]))
      }))
    classicOf(spark).internalCreateDataFrame(rdd, schema)
  }

  /** The keyed diff: rows + a `change` column
    * (inserted/deleted/updated/unchanged; `unchanged` emitted only with
    * `emitUnchanged`). Output columns are `keys ++ remaining-in-schema
    * -order ++ change`; deleted rows carry their old image, everything
    * else the new one.
    */
  def diff(
      spark: SparkSession,
      oldByBucket: IndexedSeq[Seq[(String, Long)]],
      newByBucket: IndexedSeq[Seq[(String, Long)]],
      fileSchema: StructType, keys: Seq[String],
      emitUnchanged: Boolean): DataFrame = {
    require(oldByBucket.size == newByBucket.size,
      "bucketed diff: both snapshots must share the bucket count")
    val ordered = keys ++ fileSchema.fieldNames.filterNot(keys.contains)
    val types: IndexedSeq[DataType] =
      ordered.map(n => fileSchema(fileSchema.fieldIndex(n)).dataType).toIndexedSeq
    def sortedSide(byBucket: IndexedSeq[Seq[(String, Long)]]): RDD[InternalRow] =
      bucketSide(spark, byBucket, fileSchema)
        .select(ordered.map(col): _*)
        .sortWithinPartitions(keys.map(col): _*)
        .queryExecution.toRdd
    val nKeys = keys.size
    val out = sortedSide(oldByBucket).zipPartitions(sortedSide(newByBucket)) {
      (oi, ni) => mergeSorted(oi, ni, types, nKeys, emitUnchanged)
    }
    val outSchema = StructType(
      ordered.map(n => fileSchema(fileSchema.fieldIndex(n))
        .copy(nullable = true)) :+
        StructField("change", StringType, nullable = false))
    classicOf(spark).internalCreateDataFrame(out, outSchema)
  }

  /** THREE-WAY sorted merge over bucket-aligned snapshots — the
    * exchange-free form of the branch merge ([[graft.lake.Lake
    * .mergeBranch]]'s own cost note): per key across (base, branch,
    * source), branch-only changes win, source-only changes stand,
    * identical changes coincide, and a genuine divergence emits a
    * `conflict` row instead of silently picking a side. Output =
    * `keys ++ values ++ _m` with `_m ∈ merged | conflict`; deletions
    * simply emit nothing. Same zero-shuffle shape as [[diff]].
    */
  /** Bucket count of the most recent [[merge3]] plan, -1 when the last
    * branch merge took the join path — spec observability (the two paths
    * are result-identical by contract, so only a counter can tell).
    */
  val lastMerge3Buckets =
    new java.util.concurrent.atomic.AtomicInteger(-1)

  def merge3(
      spark: SparkSession,
      baseByBucket: IndexedSeq[Seq[(String, Long)]],
      branchByBucket: IndexedSeq[Seq[(String, Long)]],
      sourceByBucket: IndexedSeq[Seq[(String, Long)]],
      fileSchema: StructType, keys: Seq[String]): DataFrame = {
    require(baseByBucket.size == branchByBucket.size &&
      baseByBucket.size == sourceByBucket.size,
      "bucketed 3-way merge: all snapshots must share the bucket count")
    lastMerge3Buckets.set(baseByBucket.size)
    val ordered = keys ++ fileSchema.fieldNames.filterNot(keys.contains)
    val types: IndexedSeq[DataType] =
      ordered.map(n => fileSchema(fileSchema.fieldIndex(n)).dataType).toIndexedSeq
    def sortedSide(byBucket: IndexedSeq[Seq[(String, Long)]]): RDD[InternalRow] =
      bucketSide(spark, byBucket, fileSchema)
        .select(ordered.map(col): _*)
        .sortWithinPartitions(keys.map(col): _*)
        .queryExecution.toRdd
    val nKeys = keys.size
    val out = sortedSide(baseByBucket).zipPartitions(
      sortedSide(branchByBucket), sortedSide(sourceByBucket)) {
      (basei, bi, si) => merge3Sorted(basei, bi, si, types, nKeys)
    }
    val outSchema = StructType(
      ordered.map(n => fileSchema(fileSchema.fieldIndex(n))
        .copy(nullable = true)) :+
        StructField("_m", StringType, nullable = false))
    classicOf(spark).internalCreateDataFrame(out, outSchema)
  }

  private def merge3Sorted(
      basei: Iterator[InternalRow], bi: Iterator[InternalRow],
      si: Iterator[InternalRow],
      types: IndexedSeq[DataType], nKeys: Int): Iterator[InternalRow] = {
    val keyOrd = RowOrdering.createNaturalAscendingOrdering(types.take(nKeys))
    def proj(from: Int, until: Int) = UnsafeProjection.create(
      (from until until).map(i => BoundReference(i, types(i), nullable = true)))
    // one key/value projection PER SIDE — a single comparison may touch
    // all three, and projections reuse their buffers
    val keyP = IndexedSeq(proj(0, nKeys), proj(0, nKeys), proj(0, nKeys))
    val valP = IndexedSeq(
      proj(nKeys, types.size), proj(nKeys, types.size), proj(nKeys, types.size))
    val merged = UTF8String.fromString("merged")
    val conflict = UTF8String.fromString("conflict")

    new Iterator[InternalRow] {
      private val its = IndexedSeq(basei, bi, si)
      private val heads = Array.tabulate[InternalRow](3)(i =>
        if (its(i).hasNext) its(i).next().copy() else null)
      private var pendingRow: InternalRow = _
      private def advance(i: Int): Unit =
        heads(i) = if (its(i).hasNext) its(i).next().copy() else null
      private def emit(row: InternalRow, m: UTF8String): InternalRow = {
        val fields = new Array[Any](types.size + 1)
        var i = 0
        while (i < types.size) { fields(i) = row.get(i, types(i)); i += 1 }
        fields(types.size) = m
        new GenericInternalRow(fields)
      }
      /** Process the smallest key across the three heads; may or may not
        * produce an output row.
        */
      private def step(): Unit = {
        // find the minimum key among present heads
        var minI = -1
        var i = 0
        while (i < 3) {
          if (heads(i) != null && (minI < 0 ||
              keyOrd.compare(keyP(i)(heads(i)), keyP(minI)(heads(minI))) < 0))
            minI = i
          i += 1
        }
        if (minI < 0) return
        val minKey = keyP(minI)(heads(minI)).copy()
        // NULL keys compare equal under the sort ordering but never match
        // under the join contract (mirrors mergeSorted's anyNull leg): a
        // NULL-keyed row is processed ALONE — gathering it with same-key
        // rows from other sides would pair rows the join-path mergeBranch
        // keeps independent, manufacturing conflicts that don't exist.
        val nullKeyed = minKey.anyNull
        // gather this key's row (or null) per side and advance those heads
        val rows = new Array[InternalRow](3)
        val vals = new Array[AnyRef](3)
        i = 0
        while (i < 3) {
          if (heads(i) != null && (if (nullKeyed) i == minI
              else keyOrd.compare(keyP(i)(heads(i)), minKey) == 0)) {
            rows(i) = heads(i)
            vals(i) = valP(i)(heads(i)).copy()
            advance(i)
          }
          i += 1
        }
        def same(a: AnyRef, b: AnyRef): Boolean =
          (a == null && b == null) || (a != null && a == b)
        val bChanged = !same(vals(1), vals(0))
        val sChanged = !same(vals(2), vals(0))
        if (bChanged && sChanged && !same(vals(1), vals(2))) {
          // a conflict row needs a sample image for the error message —
          // any present side carries the key
          val img = if (rows(1) != null) rows(1)
            else if (rows(2) != null) rows(2) else rows(0)
          pendingRow = emit(img, conflict)
        } else if (bChanged) {
          if (rows(1) != null) pendingRow = emit(rows(1), merged)
        } else if (rows(2) != null) pendingRow = emit(rows(2), merged)
      }
      override def hasNext: Boolean = {
        while (pendingRow == null &&
            (heads(0) != null || heads(1) != null || heads(2) != null)) step()
        pendingRow != null
      }
      override def next(): InternalRow = {
        if (!hasNext) throw new NoSuchElementException
        val r = pendingRow; pendingRow = null; r
      }
    }
  }

  /** Two-iterator sorted merge — the per-partition kernel. Rows coming
    * off a sort may reuse buffers, so the held row of each side is a
    * copy; projections are per-side instances so a single comparison
    * never aliases.
    */
  private def mergeSorted(
      oi: Iterator[InternalRow], ni: Iterator[InternalRow],
      types: IndexedSeq[DataType], nKeys: Int,
      emitUnchanged: Boolean): Iterator[InternalRow] = {
    val keyOrd = RowOrdering.createNaturalAscendingOrdering(types.take(nKeys))
    def proj(from: Int, until: Int) = UnsafeProjection.create(
      (from until until).map(i => BoundReference(i, types(i), nullable = true)))
    val keyO = proj(0, nKeys); val keyN = proj(0, nKeys)
    val valO = proj(nKeys, types.size); val valN = proj(nKeys, types.size)
    val inserted = UTF8String.fromString("inserted")
    val deleted = UTF8String.fromString("deleted")
    val updated = UTF8String.fromString("updated")
    val unchanged = UTF8String.fromString("unchanged")

    new Iterator[InternalRow] {
      private var o: InternalRow = advance(oi)
      private var n: InternalRow = advance(ni)
      private val pending = scala.collection.mutable.Queue.empty[InternalRow]
      private def advance(it: Iterator[InternalRow]): InternalRow =
        if (it.hasNext) it.next().copy() else null
      private def emit(row: InternalRow, change: UTF8String): InternalRow = {
        val fields = new Array[Any](types.size + 1)
        var i = 0
        while (i < types.size) { fields(i) = row.get(i, types(i)); i += 1 }
        fields(types.size) = change
        new GenericInternalRow(fields)
      }
      private def step(): Unit = {
        if (o == null && n == null) return
        if (o == null) { pending.enqueue(emit(n, inserted)); n = advance(ni); return }
        if (n == null) { pending.enqueue(emit(o, deleted)); o = advance(oi); return }
        val ko = keyO(o); val kn = keyN(n)
        val cmp = keyOrd.compare(ko, kn)
        if (cmp < 0) { pending.enqueue(emit(o, deleted)); o = advance(oi) }
        else if (cmp > 0) { pending.enqueue(emit(n, inserted)); n = advance(ni) }
        else if (ko.anyNull) {
          // equal under sort order but NULL-keyed: a NULL never matches
          // (the join contract) — both images surface
          pending.enqueue(emit(o, deleted))
          pending.enqueue(emit(n, inserted))
          o = advance(oi); n = advance(ni)
        } else {
          val same = valO(o) == valN(n)
          if (!same) pending.enqueue(emit(n, updated))
          else if (emitUnchanged) pending.enqueue(emit(n, unchanged))
          o = advance(oi); n = advance(ni)
        }
      }
      override def hasNext: Boolean = {
        while (pending.isEmpty && (o != null || n != null)) step()
        pending.nonEmpty
      }
      override def next(): InternalRow = {
        if (!hasNext) throw new NoSuchElementException
        pending.dequeue()
      }
    }
  }
}
