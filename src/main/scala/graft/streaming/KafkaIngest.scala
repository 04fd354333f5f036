package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The Kafka ingestion path (SURVEY.md §2.A4; kafka_consumer_datalake.py:
  * 21-30, kafka_producer.py:78-103).
  *
  * Two layers, split so the wire logic is testable without a broker:
  *
  *  - [[source]] is the real `readStream.format("kafka")` plan — the exact
  *    options the reference consumer uses (earliest offsets, one topic,
  *    bounded pull via `maxOffsetsPerTrigger` standing in for the
  *    reference's `LIMIT n` poll). It compiles against plain spark-sql; the
  *    connector (`spark-sql-kafka-0-10`) is a runtime plugin resolved on a
  *    real cluster via `--packages`. This container ships no broker and no
  *    connector jar, so calling `source` here throws the data-source-lookup
  *    error at analysis — the unit test pins that boundary explicitly.
  *  - [[parse]] is the wire-format projection (Kafka record → typed
  *    columns): `value` bytes → JSON → payload schema, keeping the Kafka
  *    metadata columns. It is shared by the real source and the file-source
  *    stand-in, and is oracle-checked end-to-end by the
  *    `a4_kafka_wire_roundtrip` gate (producer serialization → wire schema
  *    → parse → original rows).
  *
  * Scale: a Kafka scan parallelizes by topic-partition;
  * `maxOffsetsPerTrigger` bounds micro-batch size (the knob the reference
  * implements as `consume(limit)`), and `minPartitions` can oversplit hot
  * partitions — both plan-level settings, no consumer-loop code.
  */
object KafkaIngest {

  /** The Kafka source's fixed output schema (what `format("kafka").load()`
    * produces) — used to type the file/memory stand-ins in tests and gates.
    */
  val WireSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** JSON payload schema of the reference's transaction producer
    * (kafka_producer.py:29-37), matching [[graft.ingest.Ingest.transactions]].
    */
  val TransactionSchema: StructType = StructType(Seq(
    StructField("transaction_id", StringType),
    StructField("user_id", LongType),
    StructField("amount", DoubleType),
    StructField("currency", StringType),
    StructField("ts", TimestampType),
    StructField("status", StringType)))

  /** The reference consumer's subscription as a streaming plan
    * (kafka_consumer_datalake.py:21-30). Requires the Kafka connector on
    * the classpath at runtime.
    */
  def source(
      spark: SparkSession, bootstrapServers: String, topic: String,
      payloadSchema: StructType = TransactionSchema,
      maxOffsetsPerTrigger: Long = 10000L): DataFrame =
    parse(
      spark.readStream
        .format("kafka")
        .option("kafka.bootstrap.servers", bootstrapServers)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .option("maxOffsetsPerTrigger", maxOffsetsPerTrigger.toString)
        .load(),
      payloadSchema)

  /** Wire-format projection: decode the JSON `value` into `payloadSchema`
    * columns, keep the Kafka position columns (the consumer's provenance:
    * topic/partition/offset, kafka_consumer_datalake.py:65-70). Rows whose
    * payload does not parse surface with NULL payload columns (the
    * reference logs-and-skips; a `filter` on a mandatory field restores
    * that behavior without losing the poison-pill audit trail).
    */
  def parse(raw: DataFrame, payloadSchema: StructType = TransactionSchema): DataFrame =
    raw.select(
      from_json(col("value").cast("string"), payloadSchema).as("payload"),
      col("topic"), col("partition"), col("offset"),
      col("timestamp").as("kafka_ts"))
      .select(col("payload.*"), col("topic"), col("partition"), col("offset"),
        col("kafka_ts"))

  /** Producer-side serialization to the wire schema (kafka_producer.py:
    * 80-85: `json.dumps(payload).encode("utf-8")`, keyed by id). Used by
    * the round-trip gate and by tests as the broker-less stand-in.
    */
  def toWire(
      payload: DataFrame, keyCol: String, topic: String,
      tsCol: String): DataFrame = {
    // Kafka offsets are PER-PARTITION, dense, append-ordered. The stand-in
    // derives them as row_number − 1 over an explicit total order
    // ((tsCol, keyCol, serialized value) within the simulated partition) —
    // a pure function of the data, identical under any physical
    // partitioning (the earlier monotonically_increasing_id was
    // deterministic only under a pinned input layout) and per-partition
    // like the real thing. The serialized-payload tiebreaker matters: two
    // distinct rows sharing (key, ts) would otherwise tie in the window
    // order and get nondeterministic relative offsets across runs. One
    // bounded window shuffle keyed on the 8 simulated partitions — the
    // simulator's cost, not a production path.
    val part = pmod(xxhash64(col(keyCol)), lit(8)).cast("int")
    val serialized = to_json(struct(payload.columns.map(col).toIndexedSeq: _*))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(part).orderBy(col(tsCol), col(keyCol), serialized)
    payload.select(
      col(keyCol).cast("string").cast("binary").as("key"),
      to_json(struct(payload.columns.map(col).toIndexedSeq: _*)).cast("binary").as("value"),
      lit(topic).as("topic"),
      part.as("partition"),
      (row_number().over(w) - 1).cast("long").as("offset"),
      col(tsCol).as("timestamp"),
      lit(0).as("timestampType"))
  }
}
