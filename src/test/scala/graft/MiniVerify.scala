package graft

/** Dev tool: run a comma-separated subset of `SparkEntry.queries` into an
  * output dir (same layout as [[Verify]]) so `tools/localcheck.py` can
  * DuckDB-compare just the gates under iteration instead of all of them.
  *
  * `sbt "Test/runMain graft.MiniVerify q1,q2 /root/testdata/sf0.01 /tmp/out"`
  */
object MiniVerify {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = args(1)
    val outDir = args(2)
    val spark = GraftSession.builder("local[8]", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { n =>
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$n")
      println(f"[mini] $n done in ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    def q(s: String): String = GraftSession.jsonEscape(s)
    val json = SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
