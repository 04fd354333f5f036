package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic event generation (SURVEY.md §2.A5, kafka_producer.py:26-75) —
  * the producer's payload shapes as a deterministic, fully-distributed
  * `spark.range` pipeline (no driver loop, no RNG: every field is pure
  * arithmetic on the row id, so any engine can reproduce the dataset
  * exactly — and generation scales linearly with executors).
  *
  * The reference paces a Python loop with sleep() to hit a msgs/sec target
  * (kafka_producer.py:89-98); in Spark the analogous knobs are partition
  * count (parallelism) and, for a streaming sink, trigger interval +
  * maxOffsetsPerTrigger (SURVEY.md §2.A13).
  */
object Ingest {

  /** transaction_stream payloads (kafka_producer.py:29-37). */
  def transactions(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(
      concat(lit("tx_"), lpad(col("id").cast("string"), 8, "0")).as("transaction_id"),
      (col("id") % 10000 + 1).as("user_id"),
      // 1.00 .. 500.00, two decimals, exact in IEEE double
      (((col("id") * 37) % 49900 + 100) / 100.0).as("amount"),
      element_at(array(lit("EUR"), lit("USD"), lit("GBP")),
        (col("id") % 3 + 1).cast("int")).as("currency"),
      timestamp_seconds(
        unix_timestamp(to_timestamp(lit("2024-01-01 00:00:00"))) + col("id")).as("ts"),
      when(col("id") % 10 < 8, "approved").otherwise("declined").as("status"))

  /** transaction_flattened payloads (kafka_producer.py:38-45). */
  def transactionsFlat(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(
      concat(lit("tx_"), lpad(col("id").cast("string"), 8, "0")).as("transaction_id"),
      element_at(array(lit("FR"), lit("DE"), lit("ES"), lit("IT")),
        (col("id") % 4 + 1).cast("int")).as("user_country"),
      element_at(array(lit("card"), lit("paypal"), lit("apple_pay")),
        (col("id") % 3 + 1).cast("int")).as("payment_method"),
      (((col("id") * 37) % 49900 + 100) / 100.0).as("amount"))
}
