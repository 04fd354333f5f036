package graft

import java.nio.file.Files

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

  private def v2Scan(df: org.apache.spark.sql.DataFrame): BatchScanExec =
    df.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }
      .getOrElse(fail("no BatchScanExec in plan"))

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

  test("an impossible range plans zero partitions and returns zero rows") {
    val df = spark.read.format("graft-stats-csv").load(root)
      .filter(col("user_id") > 100000000L)
    assert(v2Scan(df).inputRDD.getNumPartitions === 0)
    assert(df.count() === 0)
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
