package graft

import java.nio.file.Files

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

  /** Whether the `spark-sql-kafka-0-10` connector is on the classpath (a
    * runtime plugin on a real cluster; absent in this container).
    */
  private def kafkaConnectorPresent: Boolean =
    scala.util.Try(Class.forName(
      "org.apache.spark.sql.kafka010.KafkaSourceProvider",
      false, getClass.getClassLoader)).isSuccess

  test("toWire offsets are a pure function of the data — layout-independent, per-partition Kafka shape") {
    val payload = graft.ingest.Ingest.transactions(spark, 500)
    def offsets(df: org.apache.spark.sql.DataFrame): Map[String, (Int, Long)] =
      KafkaIngest.toWire(df, "transaction_id", "t", "ts")
        .select(col("key").cast("string"), col("partition"), col("offset"))
        .collect()
        .map(r => r.getString(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    // identical offsets whatever the physical input layout (the previous
    // monotonically_increasing_id stand-in broke exactly here)
    val a = offsets(payload.repartition(1))
    val b = offsets(payload.repartition(13))
    assert(a === b, "offsets must not depend on input partitioning")
    // Kafka shape: per partition, offsets are dense 0..n-1
    a.toSeq.groupBy(_._2._1).foreach { case (p, rows) =>
      val offs = rows.map(_._2._2).sorted
      assert(offs === (0L until offs.length.toLong),
        s"partition $p offsets not dense from 0: ${offs.take(5)}")
    }
  }

  test("source() builds the real kafka plan; connector absence is the documented boundary") {
    assume(!kafkaConnectorPresent,
      "connector present — the live round-trip test covers this path")
    // no broker or spark-sql-kafka jar in this container: the plan must fail
    // at data-source lookup (proving the code path runs up to the connector),
    // not at compile time
    val e = intercept[Exception] {
      KafkaIngest.source(spark, "localhost:9092", "transaction_stream")
    }
    val msg = String.valueOf(e.getMessage).toLowerCase
    assert(msg.contains("kafka"))
  }

  test("live broker round-trip (runs when connector + broker exist; SKIPPED, never faked, otherwise)") {
    // ref kafka_consumer_datalake.py:21-30 — the live consume path. The
    // container ships no connector jar and no broker and coursier is
    // offline, so here this cancels; on a cluster, point
    // SPARK_GRAFT_KAFKA_BOOTSTRAP at a broker and it exercises
    // producer → broker → KafkaIngest.source end-to-end.
    val bootstrap = sys.env.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")
    assume(kafkaConnectorPresent && bootstrap.isDefined,
      "no spark-sql-kafka connector and/or SPARK_GRAFT_KAFKA_BOOTSTRAP broker in this environment")
    val bs = bootstrap.get
    val topic = s"graft_spec_${java.util.UUID.randomUUID().toString.take(8)}"
    val tx = graft.ingest.Ingest.transactions(spark, 100)
    KafkaIngest.toWire(tx, "transaction_id", topic, "ts")
      .selectExpr("key", "value")
      .write.format("kafka")
      .option("kafka.bootstrap.servers", bs)
      .option("topic", topic)
      .save()
    val out = Files.createTempDirectory("kafka_live_").toString
    val q = KafkaIngest.source(spark, bs, topic)
      .writeStream
      .format("parquet")
      .option("path", s"$out/data")
      .option("checkpointLocation", s"$out/chk")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000L)
    val back = spark.read.parquet(s"$out/data")
      .select(tx.columns.map(col).toIndexedSeq: _*)
    assert(back.except(tx).count() === 0 && tx.except(back).count() === 0)
  }
}
