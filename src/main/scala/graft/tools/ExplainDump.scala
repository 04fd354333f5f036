package graft.tools

import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` output for named registry gates to files —
  * the before/after plan evidence for optimization rounds.
  *
  * Run: `sbt "runMain graft.tools.ExplainDump <sfDir> <outDir> <suffix> [q1,q2,...]"`
  * writes `<outDir>/<query>_<suffix>.txt` per gate. Gates whose builder
  * executes jobs eagerly (lifecycle/streaming choreographies) still produce
  * the plan of the RETURNED frame — the queryable read path.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names: Seq[String] =
      if (args.length > 3) args(3).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else graft.SparkEntry.queries.keySet.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[explain] unknown gate: $name")
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val plan = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
            println(s"[explain] wrote $name")
          } catch { case e: Throwable =>
            System.err.println(s"[explain] $name failed: ${e.getMessage}")
          }
      }
    }
    spark.stop()
    graft.Tmp.purge()
  }
}
