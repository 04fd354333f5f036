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

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events" =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.read.parquet(path(dir, name))
          .withColumn("ts_us", expr("ts DIV 1000"))
      case _ =>
        spark.read.parquet(path(dir, name))
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
