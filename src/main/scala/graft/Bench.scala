package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Benchmark main: one JSON line with per-query wall-clock at
  * SPARK_GRAFT_SF_DIR (driver contract).
  *
  * A warmup pass (parquet footer reads + one small agg + one small join)
  * precedes timing so JVM/codegen/parquet-reader initialization lands on
  * the warmup, not on whichever query happens to run first.
  */
object Bench {
  /** 1-minute load average (−1.0 where the JMX bean has no value). */
  private def osLoad1(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage

  def main(args: Array[String]): Unit = {
    val loadBefore = osLoad1()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: touch every table + exercise agg/join/window codegen paths
    Tables.all.foreach(t => Tables.load(spark, sfDir, t).schema)
    Tables.orders(spark, sfDir).groupBy(col("o_orderstatus")).count().count()
    Tables.nation(spark, sfDir)
      .join(Tables.region(spark, sfDir),
        col("n_regionkey") === col("r_regionkey")).count()

    // optional subset for scaling experiments (driver runs never set this,
    // so the per-round contract still benches the full registry)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (k, _) => names(k) }
      case None => SparkEntry.queries
    }
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false }
      // a failed query must not masquerade as a fast success
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // -1.0 marks a failed query; it must not distort the aggregate, so the
    // total sums successes only and failures are listed explicitly
    val failed = results.collect { case (k, v) if v < 0 => k }
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // record box load around the run: the shared box's external load has
    // swung same-binary totals 105→222 s (BASELINE.md), so a bench number
    // is only interpretable next to the load it ran under. load1_before is
    // sampled at JVM start (before warmup), load1_after here.
    val loadAfter = osLoad1()
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""failed":$failedJson,"failed_count":${failed.size},""" +
      s""""load1_before":$loadBefore,"load1_after":$loadAfter,"sf":"$sfDir"}"""
    println(line)
    // self-recorded copy with every per-query number: the driver's captured
    // stdout tail can truncate the (200+ key) queries map, losing per-name
    // history; BENCH_SELF.json survives in the repo for BASELINE.md updates
    try {
      val out = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_SELF", "BENCH_SELF.json"))
      java.nio.file.Files.write(out, (line + "\n").getBytes("UTF-8"))
    } catch { case e: Exception =>
      System.err.println(s"[bench] could not write BENCH_SELF.json: ${e.getMessage}")
    }
    spark.stop()
  }
}
