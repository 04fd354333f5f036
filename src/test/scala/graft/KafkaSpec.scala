package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.streaming.KafkaIngest

class KafkaSpec extends SparkSpec {
  import spark.implicits._

  test("parse decodes JSON values and keeps Kafka provenance columns") {
    val json =
      """{"transaction_id":"tx_00000001","user_id":7,"amount":12.34,
        |"currency":"EUR","ts":"2024-01-01T00:00:07.000Z","status":"approved"}"""
        .stripMargin.replace("\n", "")
    val rows = Seq(Row("k1".getBytes("UTF-8"), json.getBytes("UTF-8"),
      "transaction_stream", 3, 42L,
      java.sql.Timestamp.valueOf("2024-01-01 00:00:07"), 0))
    val raw = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), KafkaIngest.WireSchema)
    val out = KafkaIngest.parse(raw).collect().head
    assert(out.getAs[String]("transaction_id") === "tx_00000001")
    assert(out.getAs[Long]("user_id") === 7L)
    assert(out.getAs[Double]("amount") === 12.34)
    assert(out.getAs[String]("topic") === "transaction_stream")
    assert(out.getAs[Int]("partition") === 3)
    assert(out.getAs[Long]("offset") === 42L)
  }

  test("poison-pill payloads surface as NULL columns, not failures") {
    val rows = Seq(Row(null, "not json at all".getBytes("UTF-8"),
      "t", 0, 0L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 0))
    val raw = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), KafkaIngest.WireSchema)
    val out = KafkaIngest.parse(raw)
    assert(out.count() === 1)
    assert(out.filter(col("transaction_id").isNull).count() === 1)
  }

  test("toWire → parse round-trips the generated payloads bit-exactly") {
    val tx = graft.ingest.Ingest.transactions(spark, 500)
    val back = KafkaIngest.parse(
      KafkaIngest.toWire(tx, "transaction_id", "transaction_stream", "ts"))
      .select(tx.columns.map(col).toIndexedSeq: _*)
    assert(back.except(tx).count() === 0 && tx.except(back).count() === 0)
  }

  test("source() builds the real kafka plan; connector absence is the documented boundary") {
    // no broker or spark-sql-kafka jar in this container: the plan must fail
    // at data-source lookup (proving the code path runs up to the connector),
    // not at compile time
    val e = intercept[Exception] {
      KafkaIngest.source(spark, "localhost:9092", "transaction_stream")
    }
    val msg = String.valueOf(e.getMessage).toLowerCase
    assert(msg.contains("kafka"))
  }
}
