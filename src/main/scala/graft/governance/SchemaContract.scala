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

  private def contractDir(root: String, feed: String) =
    new org.apache.hadoop.fs.Path(s"${Lake.streamPath(root, feed)}/_contract")

  private def fs(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Contract storage is WRITE-ONCE VERSIONED files (`_contract/v<N>.json`)
    * published by rename — the same two ideas as the snapshot commit
    * protocol, for the same two races: a reader can never observe a
    * half-written contract (the bytes land in a hidden temp file; the
    * rename publishes complete content or nothing), and two concurrent
    * evolvers can never overwrite each other (rename-to-existing fails, so
    * claiming version N+1 is a compare-and-swap — the loser re-reads the
    * winner's contract, re-validates, and retries).
    */
  private def declareVersion(
      spark: SparkSession, root: String, feed: String,
      schema: StructType, version: Int): Boolean = {
    val dir = contractDir(root, feed)
    val f = fs(spark, dir)
    f.mkdirs(dir)
    val tmp = new org.apache.hadoop.fs.Path(dir,
      s".tmp_${java.util.UUID.randomUUID().toString.replace("-", "")}")
    val out = f.create(tmp, true)
    try out.write(schema.json.getBytes("UTF-8")) finally out.close()
    val target = new org.apache.hadoop.fs.Path(dir, s"v$version.json")
    val won = !f.exists(target) && f.rename(tmp, target)
    if (!won) f.delete(tmp, false)
    won
  }

  private def readVersioned(
      spark: SparkSession, root: String, feed: String): Option[(Int, StructType)] = {
    val dir = contractDir(root, feed)
    val f = fs(spark, dir)
    if (!f.exists(dir)) None
    else {
      val versions = f.listStatus(dir).map(_.getPath.getName)
        .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
          n.stripPrefix("v").stripSuffix(".json").toInt }
      if (versions.isEmpty) None
      else {
        val v = versions.max
        val in = f.open(new org.apache.hadoop.fs.Path(dir, s"v$v.json"))
        try Some(v -> DataType.fromJson(new String(
          in.readAllBytes(), "UTF-8")).asInstanceOf[StructType])
        finally in.close()
      }
    }
  }

  /** Declare a feed's initial contract (no-op if one already exists). */
  def declare(spark: SparkSession, root: String, feed: String, schema: StructType): Unit = {
    declareVersion(spark, root, feed, schema, 1)
    ()
  }

  /** The contract currently in force, if any. */
  def read(spark: SparkSession, root: String, feed: String): Option[StructType] =
    readVersioned(spark, root, feed).map(_._2)

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
    var attempts = 0
    var result: Option[StructType] = None
    while (result.isEmpty) {
      attempts += 1
      if (attempts > 20) throw new IllegalStateException(
        s"feed $feed: contract evolution still conflicting after $attempts attempts")
      val (ver, contract) = readVersioned(spark, root, feed).getOrElse {
        // first writer declares v1 from its batch; on a lost race the
        // loop re-reads the winner's contract and validates against it
        declareVersion(spark, root, feed, df.schema, 1)
        readVersioned(spark, root, feed).get
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

      if (extras.isEmpty) result = Some(contract)
      else {
        val widened = StructType(contract.fields ++
          df.schema.fields.filter(f => extras.contains(f.name.toLowerCase)))
        // CAS on v(ver+1): losing means a concurrent evolution landed —
        // loop to validate this batch against the WINNER's contract
        // instead of silently overwriting it
        if (declareVersion(spark, root, feed, widened, ver + 1))
          result = Some(widened)
      }
    }
    val newContract = result.get
    // project into contract order so every file carries an identical layout
    val ordered = df.select(newContract.fieldNames.map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)
    Lake.appendStream(ordered, root, feed, eventTimeCol, asOfDate)
    newContract
  }
}
