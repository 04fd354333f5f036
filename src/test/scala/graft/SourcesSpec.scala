package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import graft.sources.{StatsCsvFormat, StatsCsvScan}
import org.apache.spark.sql.sources.{EqualTo, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}

class SourcesSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private lazy val root: String = {
    val dir = Files.createTempDirectory("graft_dsv2_spec_").toString
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    StatsCsvFormat.write(ev, dir, "user_id", numFiles = 8)
    dir
  }

  private def v2Scan(df: org.apache.spark.sql.DataFrame): BatchScanExec = {
    // aggregates plan adaptively; the scan lives under the AQE wrapper
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    plan.collectFirst { case b: BatchScanExec => b }
      .getOrElse(fail("no BatchScanExec in plan"))
  }

  test("unfiltered read equals the original table exactly") {
    val got = spark.read.format("graft-stats-csv").load(root)
      .orderBy("event_id").collect()
    val want = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy("event_id").collect()
    assert(got.length === want.length)
    got.zip(want).foreach { case (g, w) => assert(g === w, s"row mismatch: $g vs $w") }
  }

  test("filter pushdown prunes files at planning time; results unchanged") {
    val all = v2Scan(spark.read.format("graft-stats-csv").load(root))
      .inputRDD.getNumPartitions
    assert(all === 8, s"expected 8 part files, planned $all")
    val filtered = spark.read.format("graft-stats-csv").load(root)
      .filter(col("user_id") >= 100 && col("user_id") <= 120)
    val pruned = v2Scan(filtered).inputRDD.getNumPartitions
    assert(pruned < all, s"stats pruning planned $pruned of $all files")
    // and pruning must be invisible in results
    val want = Tables.events(spark, sf)
      .filter(col("user_id") >= 100 && col("user_id") <= 120).count()
    assert(filtered.count() === want)
  }

  test("column pruning narrows readSchema to the projected columns") {
    val df = spark.read.format("graft-stats-csv").load(root)
      .select(col("event_id"), col("value"))
    val scan = v2Scan(df)
    assert(scan.scan.readSchema().fieldNames.toSeq === Seq("event_id", "value"))
  }

  test("batch reads are vectorized: scan reports columnar, plan bridges via ColumnarToRow") {
    val df = spark.read.format("graft-stats-csv").load(root)
      .select(col("event_id"), col("value"))
    assert(v2Scan(df).supportsColumnar, "batch scan did not take the columnar path")
    assert(df.queryExecution.executedPlan.toString.contains("ColumnarToRow"))
    // row-path parity: the streaming reader (row-based) must agree exactly
    val want = Tables.events(spark, sf).select(col("event_id"), col("value"))
      .orderBy("event_id").collect()
    assert(df.orderBy("event_id").collect().toSeq === want.toSeq)
  }

  test("an impossible range plans zero partitions and returns zero rows") {
    val df = spark.read.format("graft-stats-csv").load(root)
      .filter(col("user_id") > 100000000L)
    assert(v2Scan(df).inputRDD.getNumPartitions === 0)
    assert(df.count() === 0)
  }

  test("ungrouped MIN/MAX/COUNT(*) answered from the sidecar, zero files planned") {
    val df = spark.read.format("graft-stats-csv").load(root)
      .agg(min(col("user_id")), max(col("user_id")), count(lit(1)))
    val scan = v2Scan(df)
    assert(scan.scan.isInstanceOf[graft.sources.StatsCsvAggScan],
      s"aggregate not answered from stats: ${scan.scan.getClass}")
    assert(scan.inputRDD.getNumPartitions === 1)
    val Array(got) = df.collect()
    val Array(want) = Tables.events(spark, sf)
      .agg(min(col("user_id")), max(col("user_id")), count(lit(1))).collect()
    assert(got === want)
  }

  test("a filter blocks stats-answered aggregation (falls back to a real scan)") {
    val df = spark.read.format("graft-stats-csv").load(root)
      .filter(col("user_id") >= 100)
      .agg(count(lit(1)).as("n"))
    assert(!v2Scan(df).scan.isInstanceOf[graft.sources.StatsCsvAggScan])
    val want = Tables.events(spark, sf).filter(col("user_id") >= 100).count()
    assert(df.collect()(0).getLong(0) === want)
  }

  test("grouped or non-stats-column aggregates are not pushed") {
    val grouped = spark.read.format("graft-stats-csv").load(root)
      .groupBy(col("event_type")).agg(count(lit(1)))
    assert(!v2Scan(grouped).scan.isInstanceOf[graft.sources.StatsCsvAggScan])
    val otherCol = spark.read.format("graft-stats-csv").load(root)
      .agg(min(col("event_id")))
    assert(!v2Scan(otherCol).scan.isInstanceOf[graft.sources.StatsCsvAggScan])
    val want = Tables.events(spark, sf).agg(min(col("event_id"))).collect()(0).getLong(0)
    assert(otherCol.collect()(0).getLong(0) === want)
  }

  test("streaming: maxFilesPerTrigger=3 over 8 files drains in exactly 3 micro-batches") {
    val ckpt = Files.createTempDirectory("graft_dsv2_ckpt_").toString
    val out = Files.createTempDirectory("graft_dsv2_out_").toString + "/sink"
    def runPass() = {
      val q = spark.readStream.format("graft-stats-csv")
        .option("maxFilesPerTrigger", "3").load(root)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      q
    }
    val fed = runPass().recentProgress.filter(_.numInputRows > 0)
    assert(fed.length === 3, s"expected 3+3+2 file batches, got ${fed.length}")
    assert(spark.read.parquet(out).count() === Tables.events(spark, sf).count())
    // restart on the same checkpoint: source fully committed, nothing replays
    runPass()
    assert(spark.read.parquet(out).count() ===
      Tables.events(spark, sf).count(), "checkpoint restart replayed files")
  }

  // ── write path ──

  private def v2Write(dir: String, mode: String = "overwrite",
      filter: org.apache.spark.sql.Column = lit(true)): Unit =
    Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .filter(filter)
      .write.format("graft-stats-csv")
      .option("cluster", "user_id").option("numFiles", "4")
      .mode(mode).save(dir)

  test("V2 write: round-trips exactly and honors the declared range clustering") {
    val dir = Files.createTempDirectory("graft_dsv2_w1_").toString
    v2Write(dir)
    val back = spark.read.format("graft-stats-csv").load(dir)
    val orig = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    assert(back.count() === orig.count())
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty)
    // RequiresDistributionAndOrdering produced disjoint per-file key ranges
    // NIO read: spark.read hides _-prefixed files even when named directly
    val stats = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get(dir, StatsCsvFormat.StatsFile))
      .asScala.filter(_.nonEmpty)
      .map(_.split(",")).map(a => (a(0), a(2).toLong, a(3).toLong))
      .toSeq.sortBy(_._1)
    assert(stats.length >= 2, "expected multiple clustered files")
    stats.sliding(2).foreach { case Seq((f1, _, mx1), (f2, mn2, _)) =>
      assert(mx1 <= mn2, s"files $f1 and $f2 overlap: max $mx1 > min $mn2")
    }
    // names: query-unique generation prefix + partition index, so sorted
    // listing within one write follows the cluster order and APPEND
    // generations can never collide
    assert(stats.map(_._1).forall(_.matches("part-[a-zA-Z0-9]+-\\d{5}\\.csv")),
      s"unexpected names: ${stats.map(_._1)}")
  }

  test("V2 write: overwrite truncates the previous generation at commit") {
    val dir = Files.createTempDirectory("graft_dsv2_w2_").toString
    v2Write(dir)
    val full = spark.read.format("graft-stats-csv").load(dir).count()
    v2Write(dir, filter = col("user_id") <= 5)
    val after = spark.read.format("graft-stats-csv").load(dir)
    val expect = Tables.events(spark, sf).filter(col("user_id") <= 5).count()
    assert(after.count() === expect, "stale files survived the overwrite")
    assert(after.count() < full)
    // stats sidecar describes only the new generation
    val statsTotal = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get(dir, StatsCsvFormat.StatsFile))
      .asScala.filter(_.nonEmpty).map(_.split(",")(4).toLong).sum
    assert(statsTotal === expect)
  }

  test("V2 write: append preserves prior generations, stats sidecar merges") {
    val dir = Files.createTempDirectory("graft_dsv2_w5_").toString
    v2Write(dir)
    val full = Tables.events(spark, sf).count()
    v2Write(dir, mode = "append", filter = col("user_id") <= 5)
    val extra = Tables.events(spark, sf).filter(col("user_id") <= 5).count()
    val back = spark.read.format("graft-stats-csv").load(dir)
    // count() goes through sidecar-answered pushdown — merge must be exact
    assert(back.count() === full + extra)
    // and the real rows agree (appended subset present twice for uid<=5)
    assert(back.filter(col("user_id") <= 5).count() === 2 * extra)
  }

  test("aggregate pushdown falls back when the sidecar misses a file") {
    val dir = Files.createTempDirectory("graft_dsv2_w6_").toString
    v2Write(dir)
    val statsPath = java.nio.file.Paths.get(dir, StatsCsvFormat.StatsFile)
    val lines = java.nio.file.Files.readAllLines(statsPath).asScala.filter(_.nonEmpty)
    java.nio.file.Files.write(statsPath,
      lines.drop(1).mkString("\n").getBytes("UTF-8"))
    // drop hadoop's checksum sidecar — the NIO edit stales it
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(dir, "._GRAFT_STATS.csv.crc"))
    val df = spark.read.format("graft-stats-csv").load(dir)
      .agg(count(lit(1)).as("n"))
    assert(!v2Scan(df).scan.isInstanceOf[graft.sources.StatsCsvAggScan],
      "uncovered sidecar must not answer aggregates")
    assert(df.collect()(0).getLong(0) === Tables.events(spark, sf).count())
  }

  test("V2 write: abort leaves no staged or committed output") {
    import org.apache.spark.sql.connector.write.LogicalWriteInfo
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    val dir = Files.createTempDirectory("graft_dsv2_w3_").toString
    val ddl = org.apache.spark.sql.types.StructType.fromDDL(
      "event_id BIGINT, user_id BIGINT")
    val opts = new CaseInsensitiveStringMap(
      java.util.Map.of("cluster", "user_id", "path", dir))
    val info = new LogicalWriteInfo {
      override def options(): CaseInsensitiveStringMap = opts
      override def queryId(): String = "spec-abort"
      override def schema(): org.apache.spark.sql.types.StructType = ddl
    }
    val write = new graft.sources.StatsCsvWriteBuilder(dir, info).build()
    val batch = write.toBatch
    val factory = batch.createBatchWriterFactory(null)
    val w = factory.createWriter(0, 7L)
    w.write(org.apache.spark.sql.catalyst.InternalRow(1L, 2L))
    val msg = w.commit()
    batch.abort(Array(msg))
    val left = new java.io.File(dir).listFiles().map(_.getName)
    assert(!left.exists(_.endsWith(".csv")), s"committed csv after abort: ${left.toSeq}")
    assert(!left.exists(_.startsWith(".staging")), s"staging dir survived abort: ${left.toSeq}")
  }

  test("V2 streaming sink: epoch replay converges to one file and one stats line") {
    val dir = Files.createTempDirectory("graft_dsv2_w4_").toString
    val ddl = org.apache.spark.sql.types.StructType.fromDDL(
      "event_id BIGINT, user_id BIGINT")
    val sw = new graft.sources.StatsCsvStreamingWrite(dir, ddl, "user_id", "spec-replay")
    val factory = sw.createStreamingWriterFactory(null)
    def runEpoch(): Unit = {
      val w = factory.createWriter(0, 1L, 0L)
      w.write(org.apache.spark.sql.catalyst.InternalRow(1L, 2L))
      w.write(org.apache.spark.sql.catalyst.InternalRow(3L, 4L))
      sw.commit(0L, Array(w.commit()))
    }
    runEpoch()
    runEpoch() // at-least-once delivery replays the epoch
    val csvs = new java.io.File(dir).listFiles().map(_.getName)
      .filter(n => n.endsWith(".csv") && n != StatsCsvFormat.StatsFile)
    assert(csvs.toSeq === Seq("part-00000-00000.csv"), s"duplicated epoch files: ${csvs.toSeq}")
    val stats = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get(dir, StatsCsvFormat.StatsFile))
      .asScala.filter(_.nonEmpty)
    assert(stats.size === 1 && stats.head.endsWith(",2,4,2"),
      s"stats not converged: $stats")
    // and the committed directory reads back exactly one epoch's rows
    assert(spark.read.format("graft-stats-csv").load(dir).count() === 2)
  }

  test("disjointness proofs are exact at the stats boundaries") {
    // file covers [10, 20]
    assert(!StatsCsvScan.disjoint(EqualTo("c", 10L), "c", 10L, 20L))
    assert(StatsCsvScan.disjoint(EqualTo("c", 9L), "c", 10L, 20L))
    assert(StatsCsvScan.disjoint(GreaterThan("c", 20L), "c", 10L, 20L))
    assert(!StatsCsvScan.disjoint(GreaterThanOrEqual("c", 20L), "c", 10L, 20L))
    assert(StatsCsvScan.disjoint(GreaterThanOrEqual("c", 21L), "c", 10L, 20L))
    assert(StatsCsvScan.disjoint(LessThan("c", 10L), "c", 10L, 20L))
    assert(!StatsCsvScan.disjoint(LessThanOrEqual("c", 10L), "c", 10L, 20L))
    assert(StatsCsvScan.disjoint(LessThanOrEqual("c", 9L), "c", 10L, 20L))
    // filters on other columns or non-comparisons never prune
    assert(!StatsCsvScan.disjoint(EqualTo("other", 9L), "c", 10L, 20L))
    assert(!StatsCsvScan.prunable(IsNotNull("c")))
  }
}
