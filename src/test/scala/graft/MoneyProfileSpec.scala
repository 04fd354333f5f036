package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The DECIMAL(18,2) money profile (SURVEY.md §1.4; Tables.MoneyDecimalConf).
  *
  * The reference carries money as IEEE double (ref: kafka_producer.py:33);
  * the profile declares monetary feed columns as decimal at the schema layer
  * instead. These tests pin the two contract halves:
  *
  *  1. the profile is LOSSLESS — every money column's values are unchanged
  *     (testdata money is exact 2-decimal, so the cast never rounds);
  *  2. query results are IDENTICAL under either profile — aggregation
  *     already normalizes money through decimal(18,2) (queries/Q.scala), and
  *     decimal×double arithmetic promotes to double, so the b4/b5 summaries
  *     and the TPC-H money queries produce the same values bit-for-bit.
  *
  * Oracle parity under the profile is additionally provable end-to-end by
  * running the unchanged Verify/localcheck loop with
  * `SPARK_GRAFT_MONEY_DECIMAL=true` (GraftSession wires the env to the conf).
  */
class MoneyProfileSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def withProfile[A](on: Boolean)(f: => A): A = {
    spark.conf.set(Tables.MoneyDecimalConf, on.toString)
    try f finally spark.conf.unset(Tables.MoneyDecimalConf)
  }

  /** Canonical row image with decimals collapsed to their double value, so
    * profile-induced declared-type differences (e.g. min/max of a decimal
    * column) compare by value.
    */
  private def canon(df: DataFrame): Seq[Seq[String]] = {
    val dbl = df.schema.fields.foldLeft(df) { (d, f) =>
      f.dataType match {
        case _: DecimalType => d.withColumn(f.name, col(f.name).cast("double"))
        case _ => d
      }
    }
    dbl.collect().toSeq
      .map(_.toSeq.map(v => String.valueOf(v)))
      .sortBy(_.mkString(""))
  }

  test("money columns are DECIMAL(18,2) under the profile, and losslessly so") {
    for ((t, cols) <- Tables.MoneyColumns; c <- cols) {
      val off = withProfile(false) {
        val df = Tables.load(spark, sf, t)
        assert(!df.schema(c).dataType.isInstanceOf[DecimalType], s"$t.$c default profile")
        df.select(col(c)).collect().map(_.getDouble(0)).sorted.toSeq
      }
      val on = withProfile(true) {
        val df = Tables.load(spark, sf, t)
        assert(df.schema(c).dataType == DecimalType(18, 2), s"$t.$c decimal profile")
        df.select(col(c).cast("double")).collect().map(_.getDouble(0)).sorted.toSeq
      }
      assert(on == off, s"$t.$c values changed under the decimal profile")
    }
  }

  test("b4/b5/b6 summaries and TPC-H money queries match across profiles") {
    val gates = Seq("b4_user_summary", "b5_user_summary_eur", "b6_payment_totals",
      "q_tpch_q1", "q_tpch_q6")
    for (g <- gates) {
      val fn = SparkEntry.queries(g)
      val off = withProfile(false)(canon(fn(spark, sf)))
      val on = withProfile(true)(canon(fn(spark, sf)))
      assert(on == off, s"$g diverges under the decimal money profile")
    }
  }
}
