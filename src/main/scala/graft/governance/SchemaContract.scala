package graft.governance

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructField, StructType}

import graft.lake.Lake

/** Schema CONTRACTS on feed appends — the write-side guard the reference's
  * dynamic-schema lake lacks entirely (schemas are pandas-inferred per
  * batch, kafka_consumer_datalake.py:41, so one malformed producer batch
  * silently forks the feed's schema and every downstream reader breaks
  * later, far from the cause). Here the feed's declared schema is persisted
  * as a JSON contract next to the data, and every append is validated
  * BEFORE any file lands:
  *
  *  - missing columns, type conflicts, and unknown extra columns REJECT the
  *    batch (the producer is wrong — fail at the write, not in a reader);
  *  - extra columns are accepted only under `evolve = true`, which widens
  *    the contract in the same operation (additive evolution — the one
  *    schema change parquet merge-on-read handles transparently);
  *  - accepted batches append with columns projected INTO CONTRACT ORDER,
  *    so every file in the feed carries an identical layout.
  *
  * Validation is driver-side metadata work (one schema comparison, no
  * jobs); the contract file is tiny JSON read once per append. At 100 TB
  * the cost is unchanged — this is the cheapest possible place to stop
  * schema drift, and the alternative (discovering the fork in a reader
  * months later) costs a full-feed rewrite.
  */
object SchemaContract {

  final case class Violation(reason: String)
    extends RuntimeException(reason)

  private def contractPath(root: String, feed: String) =
    new org.apache.hadoop.fs.Path(s"${Lake.streamPath(root, feed)}/_contract.json")

  private def fs(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Declare (or read back) a feed's contract. */
  def declare(spark: SparkSession, root: String, feed: String, schema: StructType): Unit = {
    val p = contractPath(root, feed)
    val out = fs(spark, p).create(p, true)
    try out.write(schema.json.getBytes("UTF-8")) finally out.close()
  }

  def read(spark: SparkSession, root: String, feed: String): Option[StructType] = {
    val p = contractPath(root, feed)
    val f = fs(spark, p)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(DataType.fromJson(new String(
        in.readAllBytes(), "UTF-8")).asInstanceOf[StructType])
      finally in.close()
    }
  }

  /** Validate `df` against the feed's contract and append it date-partitioned
    * (through [[Lake.appendStream]]) if it conforms. Returns the contract in
    * force after the append. A feed without a contract gets one declared
    * from this first batch.
    */
  def appendWithContract(
      df: DataFrame, root: String, feed: String,
      eventTimeCol: Option[String] = None,
      asOfDate: java.time.LocalDate = java.time.LocalDate.now(),
      evolve: Boolean = false): StructType = {
    val spark = df.sparkSession
    val contract = read(spark, root, feed).getOrElse {
      declare(spark, root, feed, df.schema)
      read(spark, root, feed).get
    }
    val have: Map[String, StructField] =
      df.schema.fields.map(f => f.name.toLowerCase -> f).toMap
    val declared: Map[String, StructField] =
      contract.fields.map(f => f.name.toLowerCase -> f).toMap

    val missing = declared.keySet.diff(have.keySet)
    if (missing.nonEmpty) throw Violation(
      s"feed $feed: batch is missing contract column(s) ${missing.toSeq.sorted.mkString(",")}")

    val conflicts = declared.collect {
      case (n, f) if have(n).dataType != f.dataType =>
        s"$n: contract ${f.dataType.simpleString} vs batch ${have(n).dataType.simpleString}"
    }
    if (conflicts.nonEmpty) throw Violation(
      s"feed $feed: type conflict(s) ${conflicts.mkString("; ")}")

    val extras = have.keySet.diff(declared.keySet)
    if (extras.nonEmpty && !evolve) throw Violation(
      s"feed $feed: unknown column(s) ${extras.toSeq.sorted.mkString(",")} " +
        "(append with evolve=true to widen the contract)")

    val newContract =
      if (extras.isEmpty) contract
      else {
        val widened = StructType(contract.fields ++
          df.schema.fields.filter(f => extras.contains(f.name.toLowerCase)))
        declare(spark, root, feed, widened)
        widened
      }
    // project into contract order so every file carries an identical layout
    val ordered = df.select(newContract.fieldNames.map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)
    Lake.appendStream(ordered, root, feed, eventTimeCol, asOfDate)
    newContract
  }
}
