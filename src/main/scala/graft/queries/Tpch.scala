package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Flagship TPC-H-pattern reports over the warehouse star — the canonical
  * "can a reference user run their reporting workload here" check (Q1
  * pricing summary, Q3 unshipped-revenue top-N, Q5 local-supplier volume,
  * adapted to the driver schema: `o_orderpriority` stands in for Q3's
  * ship priority; date constants sit inside the 1995-2001 testdata span).
  *
  * Exactness: every revenue/charge term is a product of decimal(12,2)
  * casts — (12,2)×(12,2)→(25,4)×(12,2)→(38,6) stays exact in both engines,
  * so the aggregation order can differ freely; averages divide the exact
  * decimal sum by the count in IEEE double (correctly rounded once).
  * Q3's LIMIT has a total order (revenue DESC, o_orderkey) so the selected
  * top-10 is engine-deterministic including ties.
  *
  * Scale shape: Q1 is one partial-agg'd scan with the date filter pushed
  * to parquet; Q3/Q5 broadcast every dimension (customer/nation/region —
  * the fact side never shuffles for those joins) and aggregate with
  * map-side partials; Q3's top-10 compiles to TakeOrderedAndProject.
  */
object Tpch {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(12,2)")
  private def revenue = sum(dec(col("l_extendedprice")) * dec(lit(1.0) - col("l_discount")))

  /** Q1: pricing summary by return flag / line status. */
  def q1(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Q.moneySum(col("l_quantity")).as("sum_qty"),
        Q.moneySum(col("l_extendedprice")).as("sum_base_price"),
        revenue.cast("double").as("sum_disc_price"),
        sum(dec(col("l_extendedprice")) * dec(lit(1.0) - col("l_discount"))
          * dec(lit(1.0) + col("l_tax"))).cast("double").as("sum_charge"),
        Q.moneyAvg(col("l_quantity")).as("avg_qty"),
        Q.moneyAvg(col("l_extendedprice")).as("avg_price"),
        Q.moneyAvg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))

  val q1Oracle: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(12,2)) * CAST(1.0 + l_tax AS DECIMAL(12,2))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY 1, 2""".stripMargin

  /** Q3: top-10 unshipped orders by revenue for one market segment. */
  def q3(s: SparkSession, d: String): DataFrame = {
    val cut = lit("1997-03-15").cast("timestamp")
    val cust = Tables.customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val ord = Tables.orders(s, d).filter(col("o_orderdate") < cut)
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    Tables.lineitem(s, d).filter(col("l_shipdate") > cut)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(revenue.cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  val q3Oracle: String =
    """SELECT o_orderkey, o_orderdate, o_orderpriority,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
      |GROUP BY 1, 2, 3
      |ORDER BY revenue DESC, o_orderkey
      |LIMIT 10""".stripMargin

  /** Q5: revenue from local suppliers (customer and supplier share a
    * nation) per nation of one region, one order-date year.
    */
  def q5(s: SparkSession, d: String): DataFrame = {
    val nat = Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val cust = Tables.customer(s, d)
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount"))
      .join(broadcast(Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey") &&
        col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(revenue.cast("double").as("revenue"))
  }

  val q5Oracle: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      |FROM region
      |JOIN nation ON n_regionkey = r_regionkey
      |JOIN customer ON c_nationkey = n_nationkey
      |JOIN orders ON o_custkey = c_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY 1""".stripMargin

  /** Q10: top-20 customers by revenue lost to returned items in one
    * quarter, with their nation — the classic returned-item report.
    */
  def q10(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-10-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(revenue.cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val q10Oracle: String =
    """SELECT c_custkey, c_name, c_acctbal, n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON o_custkey = c_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation ON n_nationkey = c_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY 1, 2, 3, 4
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  val defs: Map[String, Q.QueryFn] = Map(
    "q_tpch_q1" -> (q1 _),
    "q_tpch_q3" -> (q3 _),
    "q_tpch_q5" -> (q5 _),
    "q_tpch_q10" -> (q10 _))

  val oracles: Map[String, String] = Map(
    "q_tpch_q1" -> q1Oracle,
    "q_tpch_q3" -> q3Oracle,
    "q_tpch_q5" -> q5Oracle,
    "q_tpch_q10" -> q10Oracle)
}
