package graft

import org.apache.spark.sql.SparkSession

/** The ONE session configuration every runtime entry point (Verify, Bench,
  * Plans, test utilities) builds from — a missed config line in a
  * hand-copied builder silently runs gates under a differently-configured
  * session (UTC, nanos-as-long, AQE, and the GraftExtensions injection all
  * change results or plans).
  */
object GraftSession {

  def builder(master: String, shufflePartitions: String): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      // v2 commit: tasks rename straight into the output dir instead of a
      // second sequential job-commit rename pass. The gates and streaming
      // choreographies issue MANY small writes whose per-write commit cost
      // is pure floor; correctness here does not ride on v1's
      // all-or-nothing job commit — every multi-writer path in the lake
      // layer commits via its own staged-directory + atomic-rename protocol
      // (writeTableSnapshot/WAP/Txn), which v1 vs v2 does not change.
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      // money profile (Tables.MoneyDecimalConf): env-switchable so the SAME
      // Verify/Bench binaries can be driven under the decimal(18,2) schema
      // profile without a code change (see MoneyProfileSpec).
      .config(Tables.MoneyDecimalConf,
        sys.env.getOrElse("SPARK_GRAFT_MONEY_DECIMAL", "false"))

  /** JSON string escape: backslash, quote, and ALL control chars (<0x20) —
    * a tab or CR in builder-authored SQL or a feed description would
    * otherwise make a strict `json.load` fail.
    */
  def jsonEscape(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
