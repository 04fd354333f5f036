package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver testdata (`/root/testdata/sf*`, see TESTDATA.md).
  *
  * The reference leaves all schemas implicit (SURVEY.md §1.4); here the
  * parquet footers carry the schema, so `spark.read.parquet` is enough and
  * the vectorized reader + column pruning + predicate pushdown all apply.
  *
  * `events.ts` is written with parquet NANOS precision, which Spark does not
  * natively map to TimestampType. We read it as a raw long
  * (`spark.sql.legacy.parquet.nanosAsLong`) and derive `ts_us` (microseconds
  * since epoch, BIGINT) with integer division — a double intermediate would
  * lose precision above 2^53 ns. Queries expose `ts_us` so the DuckDB oracle
  * (`epoch_ns(ts)//1000`) compares exactly. `ts DIV 1000` truncates toward
  * zero while DuckDB's `//` floors, so this equivalence assumes non-negative
  * (post-1970) timestamps — true of all testdata; a floor-division expression
  * would be needed for pre-1970 nanos.
  *
  * The nanosAsLong conf is also set by the Verify/Bench/test session
  * builders; the set here is a fallback for externally-built sessions and is
  * session-global once applied (only `events` uses NANOS today).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Monetary columns per table. SURVEY.md §1.4: the reference carries money
    * as IEEE double (kafka_producer.py:33) and names DECIMAL(18,2) the
    * principled choice. The testdata generator emits exact 2-decimal values
    * in every one of these columns (verified: round(c,2)=c for all rows), so
    * declaring them decimal is lossless — the profile changes the declared
    * type, never a value.
    */
  val MoneyColumns: Map[String, Seq[String]] = Map(
    "orders" -> Seq("o_totalprice"),
    "lineitem" -> Seq("l_extendedprice"),
    "customer" -> Seq("c_acctbal"),
    "supplier" -> Seq("s_acctbal"),
    "part" -> Seq("p_retailprice"),
    "events" -> Seq("value"))

  /** Session conf (or env `SPARK_GRAFT_MONEY_DECIMAL=true`, read by
    * [[GraftSession]]) that switches monetary columns to DECIMAL(18,2) at
    * the schema layer. Downstream aggregation is profile-agnostic: money
    * sums/averages already normalize through decimal(18,2) (queries/Q.scala),
    * and decimal×double arithmetic promotes to double, so query results are
    * bit-identical under either profile (MoneyProfileSpec pins this; the
    * oracle gates stay hash-green with the flag on).
    */
  val MoneyDecimalConf = "spark.graft.money.decimal"

  def moneyDecimal(spark: SparkSession): Boolean =
    spark.conf.getOption(MoneyDecimalConf).exists(_.toBoolean)

  private def moneyProfile(spark: SparkSession, name: String, df: DataFrame): DataFrame =
    if (!moneyDecimal(spark)) df
    else MoneyColumns.getOrElse(name, Nil).foldLeft(df) { (d, c) =>
      d.withColumn(c, col(c).cast("decimal(18,2)"))
    }

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events" =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        moneyProfile(spark, name,
          spark.read.parquet(path(dir, name))
            .withColumn("ts_us", expr("ts DIV 1000")))
      case _ =>
        moneyProfile(spark, name, spark.read.parquet(path(dir, name)))
    }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
